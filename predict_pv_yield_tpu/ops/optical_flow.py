"""Farnebäck dense optical flow, TPU-native.

The reference's second headline workload computes Farnebäck flow between
consecutive 5-minute HRV satellite frames with OpenCV on a CPU process pool
(reference notebook ``13_3d_conv_with_optical_flow_predictions.ipynb`` cell 7:
``cv.calcOpticalFlowFarneback(pyr_scale=0.5, levels=2, winsize=40,
iterations=3, poly_n=5, poly_sigma=0.7, flags=OPTFLOW_FARNEBACK_GAUSSIAN)``,
fanned out over a SharedMemoryManager + ProcessPoolExecutor).

This module replaces that farm with one jitted XLA program, implemented from
Farnebäck's method (G. Farnebäck, "Two-frame motion estimation based on
polynomial expansion", SCIA 2003):

1.  **Polynomial expansion**: each neighbourhood is approximated as
    ``f(x) ≈ x^T A x + b^T x + c`` by Gaussian-weighted least squares over
    the basis ``{1, x, y, x², y², xy}``. The normal-equation matrix ``G`` is
    position-independent, so the fit reduces to exactly two multi-channel
    XLA convolutions (a 3-kernel x-pass and a dense 6-from-3 y-pass) and a
    constant 6×6 solve — ``G⁻¹`` is built once in numpy and folded into the
    program.
2.  **Displacement update**: with expansions (A₁,b₁), (A₂,b₂) and a current
    flow d₀, warp (A₂,b₂) by d₀, form Ā = (A₁+Ã₂)/2 and
    Δb = -½(b̃₂-b₁) + Ā d₀, Gaussian-average ``ĀᵀĀ`` and ``ĀᵀΔb`` over the
    ``winsize`` window — a fused Pallas kernel on TPU (``ops/pallas_blur``):
    both separable passes as banded-matrix MXU matmuls with the intermediate
    resident in VMEM — and solve the per-pixel 2×2 system on the VPU.
3.  **Pyramid**: coarse-to-fine over ``levels`` with scale ``pyr_scale``
    (5-tap [1,4,6,4,1] blur + stride-2 subsample for the 0.5 case), flow
    upsampled bilinearly and rescaled between levels.

Everything is **batched-first**: every function takes (N, H, W) frame pairs
and the batch dimension flows through the convolutions and the Pallas
channel dimension natively — the reference's one-process-per-frame-pair
parallelism becomes one device launch for all pairs, with no ``vmap``
wrapping the custom kernel (Mosaic compiles a single fixed grid).

Flow convention matches OpenCV: ``flow[..., 0]`` is the x (column)
displacement, ``flow[..., 1]`` the y (row) displacement, such that
``im1(y, x) ≈ im2(y + flow_y, x + flow_x)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# kernels / constants
# ---------------------------------------------------------------------------


def _gaussian_kernel(n: int, sigma: float) -> np.ndarray:
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _poly_exp_solver(poly_n: int, poly_sigma: float) -> Tuple[np.ndarray, np.ndarray]:
    """(kernels, Ginv) for the quadratic fit.

    kernels: (3, 2n+1) array [g, x·g, x²·g].
    Ginv: (6, 6) inverse normal-equation matrix for basis
    [1, x, y, x², y², xy] with the separable applicability g(x)g(y).
    """
    n = poly_n
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * poly_sigma**2))
    g /= g.sum()
    kernels = np.stack([g, x * g, (x**2) * g]).astype(np.float32)

    # 1-D moments of the applicability: s[k] = Σ g(x) x^k
    s = np.array([np.sum(g * x**k) for k in range(5)])
    exps = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2), (1, 1)]  # (p, q) per basis fn
    G = np.zeros((6, 6))
    for i, (pi, qi) in enumerate(exps):
        for j, (pj, qj) in enumerate(exps):
            G[i, j] = s[pi + pj] * s[qi + qj]
    Ginv = np.linalg.inv(G).astype(np.float32)
    return kernels, Ginv


@functools.lru_cache(maxsize=None)
def _poly_exp_conv_kernels(poly_n: int, poly_sigma: float):
    """Fused conv kernels for the six moments: one 3-channel x-pass and one
    dense (6-out, 3-in) y-pass — polynomial expansion is exactly two XLA
    convolutions. Cached as host numpy (never jnp: caching device arrays
    created under a jit trace would leak tracers)."""
    kernels, _ = _poly_exp_solver(poly_n, float(poly_sigma))
    g, xg, xxg = kernels
    size = 2 * poly_n + 1
    # x-pass: (O=3, I=1, 1, K)
    kx = np.stack([g, xg, xxg])[:, None, None, :].astype(np.float32)
    # y-pass: (O=6, I=3, K, 1); moment order [m00, m10, m01, m20, m02, m11]
    ky = np.zeros((6, 3, size, 1), np.float32)
    ky[0, 0, :, 0] = g     # m00 = c0 ∘y g
    ky[1, 1, :, 0] = g     # m10 = c1 ∘y g
    ky[2, 0, :, 0] = xg    # m01 = c0 ∘y xg
    ky[3, 2, :, 0] = g     # m20 = c2 ∘y g
    ky[4, 0, :, 0] = xxg   # m02 = c0 ∘y xxg
    ky[5, 1, :, 0] = xg    # m11 = c1 ∘y xg
    return kx, ky


# ---------------------------------------------------------------------------
# polynomial expansion (batched)
# ---------------------------------------------------------------------------


def polynomial_expansion_batched(
    images: jnp.ndarray, poly_n: int = 5, poly_sigma: float = 0.7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic-fit coefficients for (N, H, W) images.

    Returns:
        A: (N, H, W, 2, 2) symmetric quadratic term, (x, y) coordinate order.
        b: (N, H, W, 2) linear term.
    """
    _, Ginv = _poly_exp_solver(poly_n, float(poly_sigma))
    kx_np, ky_np = _poly_exp_conv_kernels(poly_n, float(poly_sigma))
    kx, ky = jnp.asarray(kx_np), jnp.asarray(ky_np)

    padded = jnp.pad(
        images, ((0, 0), (poly_n, poly_n), (poly_n, poly_n)), mode="edge"
    )[:, None]  # (N, 1, H+2n, W+2n)
    rows = jax.lax.conv_general_dilated(
        padded, kx, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (N, 3, H+2n, W)
    moments = jax.lax.conv_general_dilated(
        rows, ky, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (N, 6, H, W)
    m = jnp.transpose(moments, (0, 2, 3, 1))  # (N, H, W, 6)
    r = jnp.einsum("ij,nhwj->nhwi", jnp.asarray(Ginv), m)

    b = r[..., 1:3]
    A = jnp.stack(
        [
            jnp.stack([r[..., 3], r[..., 5] / 2], axis=-1),
            jnp.stack([r[..., 5] / 2, r[..., 4]], axis=-1),
        ],
        axis=-2,
    )  # (N, H, W, 2, 2)
    return A, b


def polynomial_expansion(
    image: jnp.ndarray, poly_n: int = 5, poly_sigma: float = 0.7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image convenience wrapper → A (H, W, 2, 2), b (H, W, 2)."""
    A, b = polynomial_expansion_batched(image[None], poly_n, poly_sigma)
    return A[0], b[0]


# ---------------------------------------------------------------------------
# sampling / resize
# ---------------------------------------------------------------------------


def bilinear_sample(field: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``field`` (H, W, ...) at fractional (ys, xs), clamped borders."""
    height, width = field.shape[:2]
    ys = jnp.clip(ys, 0.0, height - 1.0)
    xs = jnp.clip(xs, 0.0, width - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    wy = (ys - y0)[..., None] if field.ndim > 2 else ys - y0
    wx = (xs - x0)[..., None] if field.ndim > 2 else xs - x0
    top = field[y0, x0] * (1 - wx) + field[y0, x1] * wx
    bottom = field[y1, x0] * (1 - wx) + field[y1, x1] * wx
    return top * (1 - wy) + bottom * wy


def _resize_bilinear(field: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Resize the two spatial dims of (N, H, W, ...)."""
    out_shape = (field.shape[0], *shape, *field.shape[3:])
    return jax.image.resize(field, out_shape, method="bilinear")


def _downsample(images: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W): 5-tap binomial blur + 2× subsample (pyr_scale=0.5 step)."""
    k = np.array([1, 4, 6, 4, 1], dtype=np.float32) / 16.0
    padded = jnp.pad(images, ((0, 0), (2, 2), (2, 2)), mode="edge")[:, None]
    out = jax.lax.conv_general_dilated(
        padded,
        jnp.asarray(k)[None, None, :, None],
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jax.lax.conv_general_dilated(
        out,
        jnp.asarray(k)[None, None, None, :],
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0, ::2, ::2]


# ---------------------------------------------------------------------------
# flow estimation (batched)
# ---------------------------------------------------------------------------


def _update_flow(
    A1, b1, A2, b2, flow: jnp.ndarray, winsize: int, gaussian: bool
) -> jnp.ndarray:
    """One Farnebäck iteration. All args batched: A (N,H,W,2,2), b (N,H,W,2),
    flow (N,H,W,2) in (x, y)."""
    n, height, width = flow.shape[:3]
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(height, dtype=flow.dtype),
        jnp.arange(width, dtype=flow.dtype),
        indexing="ij",
    )
    sample_y = grid_y[None] + flow[..., 1]
    sample_x = grid_x[None] + flow[..., 0]

    # one 6-channel gather per pair for the warped A2/b2 fields
    packed = jnp.concatenate([A2.reshape(n, height, width, 4), b2], axis=-1)
    warped = jax.vmap(bilinear_sample)(packed, sample_y, sample_x)
    A2w = warped[..., :4].reshape(n, height, width, 2, 2)
    b2w = warped[..., 4:]

    A_avg = 0.5 * (A1 + A2w)
    delta_b = -0.5 * (b2w - b1) + jnp.einsum("nhwij,nhwj->nhwi", A_avg, flow)

    ATA = jnp.einsum("nhwki,nhwkj->nhwij", A_avg, A_avg)
    ATb = jnp.einsum("nhwki,nhwk->nhwi", A_avg, delta_b)

    if gaussian:
        sigma = max(winsize * 0.15, 1.0)  # OpenCV's Gaussian window scaling
        radius = winsize // 2
        kernel = _gaussian_kernel(radius, sigma)
    else:
        radius = (winsize - 1) // 2
        kernel = np.full(2 * radius + 1, 1.0 / winsize, dtype=np.float32)

    # smooth the 5 accumulator fields of every pair in ONE fused pass: batch
    # folds into the Pallas kernel's channel dimension (ops/pallas_blur keeps
    # the x-pass intermediate in VMEM and runs both banded-matmul passes on
    # the MXU); grouped XLA convs off-TPU.
    from predict_pv_yield_tpu.ops.pallas_blur import sep_blur

    fields = jnp.stack(
        [ATA[..., 0, 0], ATA[..., 0, 1], ATA[..., 1, 1], ATb[..., 0], ATb[..., 1]],
        axis=1,
    )  # (N, 5, H, W)
    smoothed = sep_blur(fields, kernel)
    g11, g12, g22, h1, h2 = (smoothed[:, i] for i in range(5))

    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    new_x = (g22 * h1 - g12 * h2) / det
    new_y = (g11 * h2 - g12 * h1) / det
    return jnp.stack([new_x, new_y], axis=-1)


def farneback_flow_batched(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pyr_scale: float = 0.5,
    levels: int = 2,
    winsize: int = 40,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 0.7,
    gaussian: bool = True,
) -> jnp.ndarray:
    """Dense flow for (N, H, W) image pairs → (N, H, W, 2), (dx, dy).

    Defaults are the reference's tuned parameters (notebook 13 cell 7 /
    ``optical_flow_1.ipynb`` cells 38-45). Only ``pyr_scale=0.5`` is
    supported (the reference uses nothing else); other scales would need a
    fractional-resample pyramid.
    """
    if abs(pyr_scale - 0.5) > 1e-6:
        raise NotImplementedError("only pyr_scale=0.5 is supported")

    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)

    pyramid = [(im1, im2)]
    for _ in range(levels - 1):
        prev1, prev2 = pyramid[-1]
        pyramid.append((_downsample(prev1), _downsample(prev2)))

    flow = jnp.zeros((*pyramid[-1][0].shape, 2), dtype=jnp.float32)
    for level in reversed(range(levels)):
        level_im1, level_im2 = pyramid[level]
        if flow.shape[1:3] != level_im1.shape[1:3]:
            flow = _resize_bilinear(flow, level_im1.shape[1:3]) / pyr_scale
        A1, b1 = polynomial_expansion_batched(level_im1, poly_n, poly_sigma)
        A2, b2 = polynomial_expansion_batched(level_im2, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _update_flow(A1, b1, A2, b2, flow, winsize, gaussian)
    return flow


def farneback_flow(im1: jnp.ndarray, im2: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Single-pair convenience wrapper → (H, W, 2)."""
    return farneback_flow_batched(im1[None], im2[None], **kwargs)[0]


@functools.partial(
    jax.jit, static_argnames=("winsize", "levels", "iterations", "poly_n", "gaussian")
)
def flow_sequence(
    frames: jnp.ndarray,
    winsize: int = 40,
    levels: int = 2,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 0.7,
    gaussian: bool = True,
) -> jnp.ndarray:
    """Flow for every consecutive frame pair of a (T, H, W) sequence →
    (T-1, H, W, 2). One device launch replaces the reference's per-pair
    process farm (notebook 13 cell 7)."""
    return farneback_flow_batched(
        frames[:-1],
        frames[1:],
        levels=levels,
        winsize=winsize,
        iterations=iterations,
        poly_n=poly_n,
        poly_sigma=poly_sigma,
        gaussian=gaussian,
    )
