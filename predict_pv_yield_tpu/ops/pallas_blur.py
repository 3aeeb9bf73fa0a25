"""Fused separable blur as a Pallas TPU kernel.

The Farnebäck displacement update Gaussian-averages five accumulator fields
over the ``winsize`` window (41 taps at the reference's winsize=40) three
times per pyramid level — the dominant tap-work of the whole flow pipeline.
As two XLA convolutions the horizontal pass's intermediate makes a full HBM
round trip; this kernel runs both passes back-to-back on a VMEM-resident
row strip, so the intermediate never leaves the chip.

TPU mapping: a separable correlation is two banded-matrix products, and the
MXU eats dense matmuls — so each pass is one ``dot_general`` against a
constant banded matrix (``band[k+j, j] = kernel[k]``) instead of a 41-tap
shift-and-accumulate on the VPU (which also blows the VMEM stack with
shifted-slice temporaries). Per row-tile:

    strip (C, tile+2r, W+2r) @ band_x (W+2r, W)   → x-pass   (MXU)
    band_y (tile, tile+2r) @ x-pass               → y-pass   (MXU)

The y-halo is assembled from two ordinary pipelined input blocks (the padded
input passed twice with block index maps ``i`` and ``i+1``; requires
``tile >= 2*radius``) — no dynamically-offset DMA, which Mosaic's tiled
memref slicing rejects for 3-D refs. Border handling is edge-replication
applied by the caller's pad.

Measured verdict — NEGATIVE RESULT, kept with its numbers (SURVEY phase-6
"Pallas kernel" goal evaluated honestly):

* round 1 (v5e, 48-pair 256² flow pipeline, 2-level pyramid): XLA
  grouped-conv path 75.2 frame-pairs/s vs 47.4 for this kernel. XLA's conv
  emitter wins: the banded-matmul formulation spends W/(2r+1) ≈ 6× the
  useful FLOPs multiplying the band's structural zeros, and the
  double-block halo reads the input twice from HBM.
* round 2 (cv2-exact pyramid adds a 64²-wide level): Mosaic rejects the
  kernel's (C, tile, W)→(C·W) relayout at W=64 ("infer-vector-layout:
  unsupported shape cast"), so the kernel no longer compiles for the
  production pyramid at all.

The production flow path therefore uses the XLA convs unconditionally;
``sep_blur_pallas`` remains callable for tile-size experiments and the
kernel body stays interpreter-tested (tests/test_pallas_blur.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_matrix(kernel: np.ndarray, out_size: int) -> np.ndarray:
    """(out_size + len(kernel) - 1, out_size) correlation operator:
    ``(x @ band)[j] = Σ_k x[j + k] · kernel[k]``."""
    taps = len(kernel)
    band = np.zeros((out_size + taps - 1, out_size), np.float32)
    for k in range(taps):
        band[np.arange(out_size) + k, np.arange(out_size)] = kernel[k]
    return band


def _blur_kernel(cur_ref, nxt_ref, band_x_ref, band_y_ref, out_ref, *, tile, radius):
    strip = jnp.concatenate([cur_ref[:], nxt_ref[:]], axis=1)[
        :, : tile + 2 * radius, :
    ]  # (C, tile+2r, W+2r)

    # x-pass on the MXU: contract the lane dim with the banded operator.
    acc_x = jax.lax.dot_general(
        strip,
        band_x_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, tile+2r, W)

    # y-pass on the MXU: contract the row dim.
    acc = jax.lax.dot_general(
        band_y_ref[:],
        acc_x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile, C, W)
    out_ref[:] = jnp.transpose(acc, (1, 0, 2))


def sep_blur(fields: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Edge-replicated separable correlation with a 1-D kernel applied along
    W then H. Accepts (C, H, W) or batched (N, C, H, W).

    Always the XLA grouped-conv path — measured faster than the Pallas
    banded-matmul kernel (module docstring); a leading batch dim stays the
    convolution batch (large ``feature_group_count`` lowers poorly).
    """
    kernel = np.asarray(kernel, dtype=np.float32)
    if fields.ndim == 4:
        return _sep_blur_xla_batched(fields, kernel)
    return _sep_blur_xla(fields, kernel)


def sep_blur_pallas(
    fields: jnp.ndarray,
    kernel: np.ndarray,
    tile: Optional[int] = None,
    channel_tile: Optional[int] = None,
) -> jnp.ndarray:
    """The Pallas banded-matmul kernel — tuning vehicle only (see module
    docstring for the measured negative result). Folds a leading batch dim
    into the channel grid, tiling channels and rows so any size streams
    through a bounded VMEM footprint."""
    if tile is None:
        tile = int(os.environ.get("PREDICT_PV_YIELD_TPU_PALLAS_TILE", "128"))
    if channel_tile is None:
        channel_tile = int(os.environ.get("PREDICT_PV_YIELD_TPU_PALLAS_CTILE", "8"))
    kernel = np.asarray(kernel, dtype=np.float32)
    radius = len(kernel) // 2
    if tile < 2 * radius:
        raise ValueError(f"tile {tile} must be >= 2*radius ({2 * radius})")
    batched = fields.ndim == 4
    if batched:
        n, c, height, width = fields.shape
    else:
        c, height, width = fields.shape
    if batched:
        fields = fields.reshape(n * c, height, width)
    channels = fields.shape[0]

    grid_h = -(-height // tile)  # cdiv
    grid_c = -(-channels // channel_tile)
    padded = jnp.pad(
        fields, ((0, 0), (radius, radius), (radius, radius)), mode="edge"
    )
    rows_needed = (grid_h + 1) * tile  # block indices i and i+1 must exist
    pad_rows = max(rows_needed - padded.shape[1], 0)
    pad_chans = grid_c * channel_tile - channels
    if pad_rows or pad_chans:
        padded = jnp.pad(padded, ((0, pad_chans), (0, pad_rows), (0, 0)))
    padded = padded.astype(jnp.float32)
    padded_w = padded.shape[2]

    band_x = jnp.asarray(_band_matrix(kernel, width))  # (W+2r, W)
    band_y = jnp.asarray(_band_matrix(kernel, tile).T)  # (tile, tile+2r)

    block = (channel_tile, tile, padded_w)
    out = pl.pallas_call(
        functools.partial(_blur_kernel, tile=tile, radius=radius),
        grid=(grid_c, grid_h),
        in_specs=[
            pl.BlockSpec(block, lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda c, i: (c, i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(band_x.shape, lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(band_y.shape, lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (channel_tile, tile, width), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_c * channel_tile, grid_h * tile, width), jnp.float32
        ),
    )(padded, padded, band_x, band_y)
    out = out[:channels, :height, :]
    if batched:
        out = out.reshape(n, c, height, width)
    return out


def _sep_blur_xla_batched(fields: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """(N, C, H, W): batch rides the conv batch dim, channels the groups."""
    radius = len(kernel) // 2
    channels = fields.shape[1]
    k = jnp.asarray(kernel)
    padded = jnp.pad(
        fields, ((0, 0), (0, 0), (radius, radius), (radius, radius)), mode="edge"
    )
    out = jax.lax.conv_general_dilated(
        padded,
        jnp.broadcast_to(k[None, None, None, :], (channels, 1, 1, k.shape[0])),
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=channels,
    )
    return jax.lax.conv_general_dilated(
        out,
        jnp.broadcast_to(k[None, None, :, None], (channels, 1, k.shape[0], 1)),
        (1, 1),
        [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=channels,
    )


def _sep_blur_xla(fields: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Reference path: the batched form on a singleton batch."""
    return _sep_blur_xla_batched(fields[None], kernel)[0]
