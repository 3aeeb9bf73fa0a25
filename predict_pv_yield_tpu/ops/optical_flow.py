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
    ``winsize`` window as batched grouped XLA convolutions (a Pallas
    banded-matmul kernel for this stage was measured slower and is kept as
    a documented negative result — ``ops/pallas_blur.py``), then solve the
    per-pixel 2×2 system on the VPU.
3.  **Pyramid**: coarse-to-fine over levels+1 images (OpenCV semantics:
    ``levels`` counts downscale steps), each a Gaussian-smoothed
    INTER_LINEAR resize of the original frame, flow upsampled bilinearly
    and rescaled between levels.

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


def polynomial_expansion_packed(
    images: jnp.ndarray, poly_n: int = 5, poly_sigma: float = 0.7
) -> jnp.ndarray:
    """Per-pixel quadratic-fit coefficients for (N, H, W) images, packed.

    Returns (N, H, W, 5) channels ``[a11, a12, a22, bx, by]`` — the
    symmetric quadratic term's three unique entries plus the linear term.
    This packed form is the solver's working representation throughout:
    explicit (..., 2, 2) matrices tile as T(2,128) on TPU, padding the two
    trailing size-2 dims to 128 lanes (a measured 64× HBM expansion that
    OOMed a 192-pair dispatch and throttled every smaller one), so the 2×2
    algebra downstream is written out per-channel instead of einsummed.
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
    # solve r = Ginv @ m per pixel in planar (NCHW) form — channels stay
    # full H×W planes, no small trailing dim for XLA to pad
    r = jnp.einsum("ij,njhw->nihw", jnp.asarray(Ginv), moments)
    # packed channel order [a11, a12, a22, bx, by]; moment order of r is
    # [m00, m10, m01, m20, m02, m11] → a11=r3, a22=r4, a12=r5/2, b=(r1, r2)
    packed = jnp.stack(
        [r[:, 3], r[:, 5] / 2, r[:, 4], r[:, 1], r[:, 2]], axis=-1
    )  # (N, H, W, 5)
    return packed


def polynomial_expansion_batched(
    images: jnp.ndarray, poly_n: int = 5, poly_sigma: float = 0.7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic-fit coefficients for (N, H, W) images.

    Returns:
        A: (N, H, W, 2, 2) symmetric quadratic term, (x, y) coordinate order.
        b: (N, H, W, 2) linear term.

    Convenience/inspection API — the production solver consumes
    :func:`polynomial_expansion_packed` directly (see its docstring for the
    TPU layout rationale).
    """
    p = polynomial_expansion_packed(images, poly_n, poly_sigma)
    b = p[..., 3:5]
    A = jnp.stack(
        [
            jnp.stack([p[..., 0], p[..., 1]], axis=-1),
            jnp.stack([p[..., 1], p[..., 2]], axis=-1),
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


def bilinear_gather_batched(
    field: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
) -> jnp.ndarray:
    """Batched bilinear sampling of ``field`` (N, H, W, C) at fractional
    (ys, xs) of shape (N, H, W), clamped borders.

    Lowered as four flat 1-D ``jnp.take`` gathers — measured 38% faster on
    the v5e than the equivalent vmapped 2-D advanced-indexing gather (the
    warp is ~70% of the whole Farnebäck pipeline's device time)."""
    n, height, width, channels = field.shape
    ys = jnp.clip(ys, 0.0, height - 1.0)
    xs = jnp.clip(xs, 0.0, width - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, height - 1)
    x1 = jnp.minimum(x0 + 1, width - 1)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    flat = field.reshape(n * height * width, channels)
    base = (jnp.arange(n, dtype=jnp.int32) * (height * width))[:, None, None]

    def gather(yi, xi):
        idx = (base + yi * width + xi).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(n, height, width, channels)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bottom = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bottom * wy


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


def _resize_linear(field: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Resize the two spatial dims of (N, H, W, ...) with plain (non-
    antialiased) bilinear point sampling at half-pixel-centre coordinates —
    OpenCV ``INTER_LINEAR`` semantics, which ``jax.image.resize`` does NOT
    match on downscale (it antialiases)."""
    in_h, in_w = field.shape[1:3]
    out_h, out_w = shape
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (in_h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (in_w / out_w) - 0.5
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    return jax.vmap(lambda f: bilinear_sample(f, grid_y, grid_x))(field)


def _cv_round(value: float) -> int:
    """OpenCV cvRound: round half to even (C rint semantics)."""
    return int(np.rint(value))


@functools.lru_cache(maxsize=None)
def _pyramid_smooth_kernel(sigma: float, size: int) -> np.ndarray:
    """OpenCV ``getGaussianKernel`` semantics: fixed binomial coefficients for
    sigma<=0 at small sizes, a sampled normalised Gaussian otherwise."""
    if sigma <= 0 and size <= 7:
        fixed = {
            1: [1.0],
            3: [0.25, 0.5, 0.25],
            5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
            7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
        }
        return np.asarray(fixed[size], np.float32)
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float64) - (size - 1) * 0.5
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _smooth_reflect101(images: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable blur of (N, H, W) with BORDER_REFLECT_101 (OpenCV
    ``GaussianBlur`` default)."""
    radius = len(kernel) // 2
    k = jnp.asarray(kernel)
    padded = jnp.pad(
        images, ((0, 0), (radius, radius), (radius, radius)), mode="reflect"
    )[:, None]
    out = jax.lax.conv_general_dilated(
        padded,
        k[None, None, :, None],
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jax.lax.conv_general_dilated(
        out,
        k[None, None, None, :],
        (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def _pyramid_level(
    images: jnp.ndarray, level: int, pyr_scale: float
) -> jnp.ndarray:
    """Level ``k`` input image, OpenCV ``calcOpticalFlowFarneback`` semantics:
    Gaussian-smooth the ORIGINAL full-resolution image with
    ``sigma = (1/scale − 1)/2`` (ksize = round(5σ)|1, min 3 — so level 0 gets
    a fixed 3-tap [1,2,1]/4 pre-blur), then one INTER_LINEAR resize straight
    to the level's size. Not a cascaded half-res pyramid."""
    scale = pyr_scale**level
    sigma = (1.0 / scale - 1.0) * 0.5
    size = max(_cv_round(sigma * 5) | 1, 3)
    smoothed = _smooth_reflect101(images, _pyramid_smooth_kernel(sigma, size))
    if level == 0:
        return smoothed
    out_h = _cv_round(images.shape[1] * scale)
    out_w = _cv_round(images.shape[2] * scale)
    return _resize_linear(smoothed, (out_h, out_w))


# ---------------------------------------------------------------------------
# flow estimation (batched)
# ---------------------------------------------------------------------------


# OpenCV's FarnebackUpdateMatrices damps the normal-equation fields in a
# 5-pixel border ramp so ill-posed edge pixels barely vote in the window
# average (constants extracted verbatim from cv2's optflowgf rodata).
_BORDER_RAMP = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)


@functools.lru_cache(maxsize=None)
def _border_scale(height: int, width: int) -> np.ndarray:
    """(H, W) damping factors: ramp within 5 px of any edge, 1 elsewhere."""
    ramp = _BORDER_RAMP
    def axis_weights(size: int) -> np.ndarray:
        w = np.ones(size, np.float32)
        m = min(len(ramp), size)
        w[:m] *= ramp[:m]
        w[size - m:] *= ramp[:m][::-1]
        return w
    return axis_weights(height)[:, None] * axis_weights(width)[None, :]


def _update_flow(
    p1, p2, flow: jnp.ndarray, winsize: int, gaussian: bool
) -> jnp.ndarray:
    """One Farnebäck iteration. ``p1``/``p2`` are packed expansions
    (N,H,W,5) ``[a11, a12, a22, bx, by]`` (see polynomial_expansion_packed),
    flow (N,H,W,2) in (x, y). Matches OpenCV's FarnebackUpdateMatrices
    semantics: when the warped sample's floor cell leaves [0,W-2]×[0,H-2] the
    pixel uses Ā=A1 and a zero b-difference, and all fields are damped by the
    5-px border ramp before the window average.

    The 2×2 linear algebra (Ā·flow, ĀᵀĀ, Āᵀδb) is written out per symmetric
    channel instead of einsummed over explicit (…, 2, 2) matrices: those
    einsums forced XLA to materialise T(2,128)-tiled temporaries whose two
    trailing size-2 dims pad 64× in HBM — 12 GB for a 192-pair dispatch
    (measured OOM) and the throughput cliff behind the round-4 scaling
    question. Channel form keeps every temp a dense (N,H,W) plane."""
    n, height, width = flow.shape[:3]
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(height, dtype=flow.dtype),
        jnp.arange(width, dtype=flow.dtype),
        indexing="ij",
    )
    fx, fy = flow[..., 0], flow[..., 1]
    sample_y = grid_y[None] + fy
    sample_x = grid_x[None] + fx

    # one 5-channel gather for the warped A2/b2 fields (A is symmetric, so
    # a12 ships once; the gather dominates device time — see bilinear_gather)
    warped = bilinear_gather_batched(p2, sample_y, sample_x)

    # cv2 takes the no-warp branch unless floor(sample) is strictly interior
    x_floor = jnp.floor(sample_x)
    y_floor = jnp.floor(sample_y)
    oob = ~(
        (x_floor >= 0) & (x_floor <= width - 2)
        & (y_floor >= 0) & (y_floor <= height - 2)
    )
    a11 = jnp.where(oob, p1[..., 0], 0.5 * (p1[..., 0] + warped[..., 0]))
    a12 = jnp.where(oob, p1[..., 1], 0.5 * (p1[..., 1] + warped[..., 1]))
    a22 = jnp.where(oob, p1[..., 2], 0.5 * (p1[..., 2] + warped[..., 2]))
    # cv2's OOB else-branch zeroes only the WARPED b2 taps, so the pixel
    # still contributes 0.5*b1 (FarnebackUpdateMatrices: r2=r3=0 then
    # r2=(R0-r2)*0.5) — zeroing the whole difference measured up to
    # 0.009 px border error vs cv2; this form is exact (4e-5 px)
    bdx = -0.5 * (jnp.where(oob, 0.0, warped[..., 3]) - p1[..., 3])
    bdy = -0.5 * (jnp.where(oob, 0.0, warped[..., 4]) - p1[..., 4])
    dx = bdx + a11 * fx + a12 * fy
    dy = bdy + a12 * fx + a22 * fy

    scale = jnp.asarray(_border_scale(height, width))[None]
    a11, a12, a22 = a11 * scale, a12 * scale, a22 * scale
    dx, dy = dx * scale, dy * scale

    # ĀᵀĀ and Āᵀδb with Ā symmetric, per channel
    g11 = a11 * a11 + a12 * a12
    g12 = a12 * (a11 + a22)
    g22 = a12 * a12 + a22 * a22
    h1 = a11 * dx + a12 * dy
    h2 = a12 * dx + a22 * dy

    radius = winsize // 2
    if gaussian:
        sigma = radius * 0.3  # cv2: sigma = (block_size/2) * 0.3
        kernel = _gaussian_kernel(radius, sigma)
    else:
        kernel = np.full(2 * radius + 1, 1.0 / (2 * radius + 1), dtype=np.float32)

    # smooth the 5 accumulator fields of every pair in one batched pass —
    # grouped XLA convs (a Pallas banded-matmul kernel was built, measured,
    # and rejected with numbers: ops/pallas_blur.py module docstring).
    from predict_pv_yield_tpu.ops.pallas_blur import sep_blur

    fields = jnp.stack([g11, g12, g22, h1, h2], axis=1)  # (N, 5, H, W)
    smoothed = sep_blur(fields, kernel)
    g11, g12, g22, h1, h2 = (smoothed[:, i] for i in range(5))

    # cv2's unconditional additive regularisation (FarnebackUpdateFlow_*:
    # 1/(g11*g22 - g12² + 1e-3)) — a sign-preserving 1e-9 clamp measured up
    # to 1.07 px border error where the damping ramp shrinks det; +1e-3
    # brings the border band to exact parity (4e-5 px). The native twin
    # (farneback.cpp) applies the same constant.
    det = g11 * g22 - g12 * g12 + 1e-3
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
    ``optical_flow_1.ipynb`` cells 38-45). Semantics follow OpenCV's
    ``calcOpticalFlowFarneback`` exactly (the cv2-gated parity tests in
    ``tests/test_opencv_parity.py`` hold both to sub-pixel agreement):
    ``levels`` counts DOWNSCALE steps, so levels+1 pyramid images are used,
    capped so no level's short side drops below 32 px; each level is a
    smoothed INTER_LINEAR resize of the original (``_pyramid_level``).
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)

    min_side = min(im1.shape[1], im1.shape[2])
    levels_used = 0
    for k in range(levels):
        if min_side * pyr_scale ** (k + 1) < 32.0:
            break
        levels_used = k + 1

    flow = None
    for level in reversed(range(levels_used + 1)):
        level_im1 = _pyramid_level(im1, level, pyr_scale)
        level_im2 = _pyramid_level(im2, level, pyr_scale)
        if flow is None:
            flow = jnp.zeros((*level_im1.shape, 2), dtype=jnp.float32)
        elif flow.shape[1:3] != level_im1.shape[1:3]:
            flow = _resize_linear(flow, level_im1.shape[1:3]) / pyr_scale
        p1 = polynomial_expansion_packed(level_im1, poly_n, poly_sigma)
        p2 = polynomial_expansion_packed(level_im2, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _update_flow(p1, p2, flow, winsize, gaussian)
    return flow


def farneback_flow(im1: jnp.ndarray, im2: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Single-pair convenience wrapper → (H, W, 2)."""
    return farneback_flow_batched(im1[None], im2[None], **kwargs)[0]


def flow_sequence_sharded(frames: jnp.ndarray, mesh=None, **kwargs) -> jnp.ndarray:
    """Multi-chip ``flow_sequence``: the (T-1) frame-pair batch is sharded
    over the mesh's ``data`` axis and the whole pipeline runs SPMD — each
    chip computes its pairs with zero collectives (the pairs are
    independent, exactly like the reference's one-process-per-pair farm,
    notebook 13 cell 7, but scaled across a TPU slice instead of CPU
    workers). Results gather back only if the caller fetches them."""
    from predict_pv_yield_tpu.parallel.mesh import batch_sharding, mesh_for_batch

    pairs = frames.shape[0] - 1
    if mesh is None:
        mesh = mesh_for_batch(pairs)
    sharding = batch_sharding(mesh)
    im1 = jax.device_put(frames[:-1], sharding)
    im2 = jax.device_put(frames[1:], sharding)
    flow_fn = _sharded_flow_fn(sharding, tuple(sorted(kwargs.items())))
    return flow_fn(im1, im2)


@functools.lru_cache(maxsize=8)
def _sharded_flow_fn(sharding, kwargs_items):
    """jit cache keyed on (sharding, kwargs): jax.jit caches on callable
    identity, so building a fresh ``functools.partial`` per call would
    re-trace and re-compile the whole Farnebäck program every super-batch.
    Bounded so a mesh-churning process (e.g. a sweep) cannot pin every
    compiled executable for its lifetime; eviction only costs a re-trace."""
    return jax.jit(
        functools.partial(farneback_flow_batched, **dict(kwargs_items)),
        in_shardings=(sharding, sharding),
        out_shardings=sharding,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "winsize", "levels", "iterations", "poly_n", "poly_sigma", "gaussian",
    ),
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
