"""Flow-based image warping and the triangular prediction matrix.

Native equivalents of the reference's ``remap_image`` (cv.remap with
INTER_LINEAR + constant-NaN border; notebook 13 cell 9) and
``compute_optical_flow_predictions`` (n source images → n−1 flows →
n(n−1)/2 warped future frames indexed by (T0, forecast step); cell 9).

Semantics of ``remap_image`` match the notebook exactly:
``dst(y, x) = src(y − flow_y(y, x), x − flow_x(y, x))`` with bilinear
interpolation, and NaN wherever a sample would read outside the image —
warping the image *forwards* in time by the flow field.

The triangular loop becomes a dense (T0, step) grid computed in one vmapped
launch: static shapes (XLA requirement), with entries beyond each T0's valid
horizon simply never consumed downstream (the sampler indexes the triangle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def remap_batched(images: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """Warp ``images`` (N, H, W) forward by ``flows`` (N, H, W, 2), (dx, dy).

    Out-of-bounds samples become NaN (the notebook's BORDER_CONSTANT=NaN),
    so downstream crop sampling can reject smeared borders. The sampling is
    four flat 1-D gathers — the TPU-fast lowering (see
    ``optical_flow.bilinear_gather_batched``).
    """
    n, height, width = images.shape
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    sample_y = grid_y[None] - flows[..., 1]
    sample_x = grid_x[None] - flows[..., 0]

    # cv2.remap(BORDER_CONSTANT=NaN, INTER_LINEAR) NaNs a sample whenever
    # its bilinear support crosses the edge — INCLUDING exactly the last
    # row/column (the zero-weight NaN tap still propagates in float math),
    # so the far bound is exclusive
    in_bounds = (
        (sample_y >= 0.0)
        & (sample_y < height - 1.0)
        & (sample_x >= 0.0)
        & (sample_x < width - 1.0)
    )

    from predict_pv_yield_tpu.ops.optical_flow import bilinear_gather_batched

    warped = bilinear_gather_batched(images[..., None], sample_y, sample_x)[..., 0]
    return jnp.where(in_bounds, warped, jnp.nan)


def remap_image(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Single-image convenience wrapper over :func:`remap_batched`."""
    return remap_batched(image[None], flow[None])[0]


@jax.jit
def flow_predictions(sat_data: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """The prediction matrix.

    Args:
        sat_data: (T, H, W) normalised satellite frames.
        flows: (T-1, H, W, 2) flow between consecutive frames.

    Returns:
        (T-1, T-1, H, W) array: ``out[i, s]`` is frame i warped forward by
        ``flows[i] * (s+1)`` — the prediction for timestep ``i + s + 1``.
        Entries with ``i + s + 1 >= T`` extrapolate past the sequence end
        (valid images, just without ground truth); consumers index the
        triangle ``s < T - 1 - i``.
    """
    num_flows = flows.shape[0]
    height, width = sat_data.shape[1:]
    steps = jnp.arange(1, num_flows + 1, dtype=jnp.float32)

    # one flat batch of (source, step) pairs → one batched gather
    sources = jnp.broadcast_to(
        sat_data[:-1, None], (num_flows, num_flows, height, width)
    ).reshape(num_flows * num_flows, height, width)
    scaled_flows = (
        flows[:, None] * steps[None, :, None, None, None]
    ).reshape(num_flows * num_flows, height, width, 2)
    warped = remap_batched(sources, scaled_flows)
    return warped.reshape(num_flows, num_flows, height, width)


def weighted_average_flow(flows: jnp.ndarray) -> jnp.ndarray:
    """Recency-weighted average of warm-up flows (reference
    ``optical_flow_1.ipynb`` cell 22): ``np.average(flows, axis=0,
    weights=range(1, n+1))`` — the most recent frame pair counts most.
    ``flows`` is (N, H, W, 2); returns (H, W, 2) to extrapolate with
    (``remap_image(image_t0, flow * i)``, cell 35)."""
    n = flows.shape[0]
    weights = jnp.arange(1, n + 1, dtype=jnp.float32)
    weighted = (flows * weights[:, None, None, None]).sum(axis=0)
    return weighted / weights.sum()


def prediction_valid_mask(num_source_timesteps: int) -> jnp.ndarray:
    """(T-1, T-1) bool: which (source i, step s) pairs have ground truth."""
    num_flows = num_source_timesteps - 1
    i = jnp.arange(num_flows)[:, None]
    s = jnp.arange(num_flows)[None, :]
    return i + s + 1 < num_source_timesteps
