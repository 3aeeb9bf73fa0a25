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
    position-independent, so the fit reduces to six separable correlations
    (three 1-D kernels per axis) and a constant 6×6 solve — ``G⁻¹`` is built
    once in numpy and folded into the program as a constant.
2.  **Displacement update**: with expansions (A₁,b₁), (A₂,b₂) and a current
    flow d₀, warp (A₂,b₂) by d₀, form Ā = (A₁+Ã₂)/2 and
    Δb = -½(b̃₂-b₁) + Ā d₀, Gaussian-average ``ĀᵀĀ`` and ``ĀᵀΔb`` over the
    ``winsize`` window, and solve the per-pixel 2×2 system.
3.  **Pyramid**: coarse-to-fine over ``levels`` with scale ``pyr_scale``
    (5-tap [1,4,6,4,1] blur + stride-2 subsample for the 0.5 case), flow
    upsampled bilinearly and rescaled between levels.

Everything is ``jnp`` with static shapes: convolutions hit the XLA conv
emitter, the per-pixel solves are fused elementwise VPU work, and whole frame
*sequences* batch through ``vmap`` — the reference's one-process-per-frame-pair
parallelism becomes one device launch for all pairs.

Flow convention matches OpenCV: ``flow[..., 0]`` is the x (column)
displacement, ``flow[..., 1]`` the y (row) displacement, such that
``im1(y, x) ≈ im2(y + flow_y, x + flow_x)``.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# small separable-correlation helpers
# ---------------------------------------------------------------------------


def _gaussian_kernel(n: int, sigma: float) -> np.ndarray:
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _sep_correlate(image: jnp.ndarray, kx: np.ndarray, ky: np.ndarray) -> jnp.ndarray:
    """2-D correlation with the separable kernel ky (rows) ⊗ kx (cols),
    edge-replicated borders. image: (H, W)."""
    ry = len(ky) // 2
    rx = len(kx) // 2
    padded = jnp.pad(image, ((ry, ry), (rx, rx)), mode="edge")
    # XLA convs are cross-correlations (no kernel flip) — exactly what the
    # moment computation needs; rows then cols.
    kyr = jnp.asarray(ky)
    kxr = jnp.asarray(kx)
    out = jax.lax.conv_general_dilated(
        padded[None, None, :, :],
        kyr[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jax.lax.conv_general_dilated(
        out,
        kxr[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _blur(image: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    return _sep_correlate(image, kernel, kernel)


# ---------------------------------------------------------------------------
# polynomial expansion
# ---------------------------------------------------------------------------


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
    dense (6-out, 3-in) y-pass, so polynomial expansion is exactly two XLA
    convolutions instead of twelve."""
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
    # cache host numpy only — caching jnp arrays here would capture tracers
    # when first invoked inside a jit trace
    return kx, ky


def polynomial_expansion(
    image: jnp.ndarray, poly_n: int = 5, poly_sigma: float = 0.7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic-fit coefficients.

    Returns:
        A: (H, W, 2, 2) symmetric quadratic term, (x, y) coordinate order.
        b: (H, W, 2) linear term.
    """
    _, Ginv = _poly_exp_solver(poly_n, float(poly_sigma))
    kx_np, ky_np = _poly_exp_conv_kernels(poly_n, float(poly_sigma))
    kx, ky = jnp.asarray(kx_np), jnp.asarray(ky_np)

    padded = jnp.pad(image, poly_n, mode="edge")[None, None]
    rows = jax.lax.conv_general_dilated(
        padded, kx, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (1, 3, H+2n, W)
    moments = jax.lax.conv_general_dilated(
        rows, ky, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (1, 6, H, W)
    m = jnp.transpose(moments[0], (1, 2, 0))  # (H, W, 6)
    r = jnp.einsum("ij,hwj->hwi", jnp.asarray(Ginv), m)  # [c, bx, by, axx, ayy, axy]

    b = r[..., 1:3]
    A = jnp.stack(
        [
            jnp.stack([r[..., 3], r[..., 5] / 2], axis=-1),
            jnp.stack([r[..., 5] / 2, r[..., 4]], axis=-1),
        ],
        axis=-2,
    )  # (H, W, 2, 2), rows/cols indexed in (x, y) order
    return A, b


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
    return jax.image.resize(field, (*shape, *field.shape[2:]), method="bilinear")


def _downsample(image: jnp.ndarray) -> jnp.ndarray:
    """5-tap binomial blur + 2× subsample (the pyr_scale=0.5 pyramid step)."""
    kernel = np.array([1, 4, 6, 4, 1], dtype=np.float32) / 16.0
    return _blur(image, kernel)[::2, ::2]


# ---------------------------------------------------------------------------
# flow estimation
# ---------------------------------------------------------------------------


def _update_flow(
    A1, b1, A2, b2, flow: jnp.ndarray, winsize: int, gaussian: bool
) -> jnp.ndarray:
    """One Farnebäck iteration at a fixed scale. flow: (H, W, 2) in (x, y)."""
    height, width = flow.shape[:2]
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(height, dtype=flow.dtype),
        jnp.arange(width, dtype=flow.dtype),
        indexing="ij",
    )
    sample_y = grid_y + flow[..., 1]
    sample_x = grid_x + flow[..., 0]

    # one 6-channel gather for the warped A2 and b2 fields
    packed = jnp.concatenate([A2.reshape(height, width, 4), b2], axis=-1)
    warped = bilinear_sample(packed, sample_y, sample_x)
    A2w = warped[..., :4].reshape(height, width, 2, 2)
    b2w = warped[..., 4:]

    A_avg = 0.5 * (A1 + A2w)
    delta_b = -0.5 * (b2w - b1) + jnp.einsum("hwij,hwj->hwi", A_avg, flow)

    # accumulate ATA (2×2 sym) and ATb (2) over the window
    ATA = jnp.einsum("hwki,hwkj->hwij", A_avg, A_avg)
    ATb = jnp.einsum("hwki,hwk->hwi", A_avg, delta_b)

    if gaussian:
        sigma = max(winsize * 0.15, 1.0)  # OpenCV's Gaussian window scaling
        radius = winsize // 2
        kernel = _gaussian_kernel(radius, sigma)
    else:
        radius = (winsize - 1) // 2
        kernel = np.full(2 * radius + 1, 1.0 / winsize, dtype=np.float32)

    # smooth the 5 accumulator fields with two grouped convolutions
    # (one x-pass, one y-pass) instead of 10 separate launches.
    fields = jnp.stack(
        [ATA[..., 0, 0], ATA[..., 0, 1], ATA[..., 1, 1], ATb[..., 0], ATb[..., 1]]
    )  # (5, H, W)
    k = jnp.asarray(kernel)
    padded = jnp.pad(fields, ((0, 0), (radius, radius), (radius, radius)), mode="edge")
    smoothed = jax.lax.conv_general_dilated(
        padded[None],
        jnp.broadcast_to(k[None, None, None, :], (5, 1, 1, k.shape[0])),
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=5,
    )
    smoothed = jax.lax.conv_general_dilated(
        smoothed,
        jnp.broadcast_to(k[None, None, :, None], (5, 1, k.shape[0], 1)),
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=5,
    )[0]

    g11, g12, g22, h1, h2 = smoothed
    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    new_x = (g22 * h1 - g12 * h2) / det
    new_y = (g11 * h2 - g12 * h1) / det
    return jnp.stack([new_x, new_y], axis=-1)


def farneback_flow(
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
    """Dense flow between two grayscale images → (H, W, 2), (dx, dy).

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
        if flow.shape[:2] != level_im1.shape:
            flow = _resize_bilinear(flow, level_im1.shape) / pyr_scale
        A1, b1 = polynomial_expansion(level_im1, poly_n, poly_sigma)
        A2, b2 = polynomial_expansion(level_im2, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _update_flow(A1, b1, A2, b2, flow, winsize, gaussian)
    return flow


@functools.partial(jax.jit, static_argnames=("winsize", "levels", "iterations", "poly_n", "gaussian"))
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

    def pair_flow(im1, im2):
        return farneback_flow(
            im1,
            im2,
            levels=levels,
            winsize=winsize,
            iterations=iterations,
            poly_n=poly_n,
            poly_sigma=poly_sigma,
            gaussian=gaussian,
        )

    return jax.vmap(pair_flow)(frames[:-1], frames[1:])
