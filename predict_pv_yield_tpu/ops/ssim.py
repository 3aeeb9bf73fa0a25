"""Structural similarity (SSIM).

The reference evaluates optical-flow predictions against persistence with
scikit-image's ``structural_similarity`` (``optical_flow_1.ipynb`` cell 35).
This is a jittable implementation matching skimage's defaults: 7×7 uniform
window, K1=0.01, K2=0.03, no Gaussian weighting, mean over the valid
(interior) region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform_filter(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter with VALID padding → (H-size+1, W-size+1)."""
    kernel = jnp.full((1, 1, size, size), 1.0 / (size * size), dtype=image.dtype)
    out = jax.lax.conv_general_dilated(
        image[None, None],
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def ssim(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    data_range: float | None = None,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM between two (H, W) images (skimage-compatible)."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    if data_range is None:
        # skimage never derives the range from the data: for float inputs
        # the reference-era version used the dtype range, 2.0 (the notebook
        # calls structural_similarity with no data_range) — newer skimage
        # raises instead. Matching the era the reference ran reproduces its
        # numbers; pass data_range explicitly for anything else.
        data_range = 2.0

    n = win_size * win_size
    cov_norm = n / (n - 1)  # sample covariance, as in skimage

    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    numerator = (2 * ux * uy + c1) * (2 * vxy + c2)
    denominator = (ux**2 + uy**2 + c1) * (vx + vy + c2)
    return jnp.mean(numerator / denominator)
