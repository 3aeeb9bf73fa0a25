"""Fused on-device preprocessing.

The reference decodes batches on the host, once per DataLoader worker:
int16 satellite counts → float32, subtract per-channel SAT_MEAN, divide by
SAT_STD (reference ``netcdf_dataset.py:96-101``), plus NaN cleanup and
optional crops in the notebooks. On TPU that order is wrong twice over:
int16→float32 triples the bytes crossing PCIe/DMA, and per-worker numpy
burns host CPU the accelerator then waits on.

Here the *raw int16* batch ships to HBM and one jitted program does decode,
normalise, crop and (optionally) timestep-stacking in a single fusion — the
"fused XLA preprocessing stage" of the north star (``BASELINE.json:5``).
XLA fuses the widening, the subtract/multiply and the slice into one pass
over HBM, so the cost is one read of the int16 data and one write of the
result.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from predict_pv_yield_tpu.consts import SAT_MEAN, SAT_STD, SAT_VARIABLE_NAMES
from predict_pv_yield_tpu.data.batch import Batch


def channel_stats(channel_names) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, std) vectors for a satellite channel subset, in order."""
    index = {name: i for i, name in enumerate(SAT_VARIABLE_NAMES)}
    idx = [index[name] for name in channel_names]
    return jnp.asarray(SAT_MEAN[idx]), jnp.asarray(SAT_STD[idx])


@functools.partial(
    jax.jit, static_argnames=("crop", "missing_to_zero", "channel_last")
)
def decode_satellite(
    raw: jnp.ndarray,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    crop: Optional[int] = None,
    missing_to_zero: bool = True,
    channel_last: bool = False,
) -> jnp.ndarray:
    """int16 counts (B, C, T, H, W) → normalised float32, optionally
    centre-cropped to ``crop`` px.

    ``channel_last``: the input is still the (B, T, H, W, C) wire layout
    nowcasting_dataset writes — the transpose to canonical runs HERE, fused
    with the decode (one HBM pass), instead of as a serial strided host copy
    (see ``netcdf_reader.canonical_or_deferred``).

    Missing data is encoded as −1 in the archives (notebook 13 cell 10);
    with ``missing_to_zero`` it lands at 0 after normalisation (the models'
    ``nan_to_num`` contract) instead of becoming NaN on device.
    """
    if channel_last:
        raw = jnp.transpose(raw, (0, 4, 1, 2, 3))
    missing = raw == -1
    data = raw.astype(jnp.float32)
    data = (data - mean[None, :, None, None, None]) / std[None, :, None, None, None]
    if missing_to_zero:
        data = jnp.where(missing, 0.0, data)
    if crop is not None:
        height, width = data.shape[-2:]
        if crop > height or crop > width:
            # negative slice starts would silently return a tiny corner
            # crop; shapes are static so this raises at trace time
            raise ValueError(
                f"crop {crop}px exceeds the {height}x{width}px image"
            )
        top = (height - crop) // 2
        left = (width - crop) // 2
        data = data[..., top : top + crop, left : left + crop]
    return data


def _decode_group(group, channel_names, crop: Optional[int]):
    """One imagery group's decode: ``None`` data → unchanged; float in
    channel-last wire layout → transpose only; float canonical → unchanged;
    int16 → the fused decode/normalise/crop. Shared by the satellite and
    HRV groups so the four-way branch exists once."""
    data = group.data
    if data is None:
        return group
    if jnp.issubdtype(data.dtype, jnp.floating):
        if group.channel_last:
            return group.replace(
                data=jnp.transpose(data, (0, 4, 1, 2, 3)), channel_last=False
            )
        return group
    mean, std = channel_stats(channel_names)
    decoded = decode_satellite(
        data, mean, std, crop=crop, channel_last=group.channel_last
    )
    return group.replace(data=decoded, channel_last=False)


def preprocess_batch(
    batch: Batch,
    channel_names=None,
    crop: Optional[int] = None,
    hrv_crop: Optional[int] = None,
) -> Batch:
    """Decode/normalise a device Batch whose satellite field is raw int16.

    No-op for already-float satellite data (prepared v15-style datasets ship
    normalised floats; raw zarr-sourced shards ship int16). ``crop`` applies
    to the main satellite group only — HRV lives on its own finer-resolution
    grid, where the same pixel count spans a different ground extent, so it
    takes its own ``hrv_crop``.
    """
    # HRV group decodes independently of the main satellite group (it may
    # be int16 while satellite is float or absent entirely)
    if batch.hrvsatellite.data is not None:
        batch = batch.replace(
            hrvsatellite=_decode_group(batch.hrvsatellite, ["HRV"], hrv_crop)
        )
    sat = batch.satellite.data
    channel_last = batch.satellite.channel_last
    if sat is None:
        return batch
    if jnp.issubdtype(sat.dtype, jnp.floating):
        group = _decode_group(batch.satellite, None, crop)
        # identity-preserving no-op for already-canonical float data
        return batch if group is batch.satellite else batch.replace(satellite=group)
    n_channels = sat.shape[-1] if channel_last else sat.shape[1]
    if channel_names is None:
        # No dataset configuration available: fall back by channel count.
        # 12 → the full HRV-first list; ≤11 → the non-HRV channels in order
        # (the common prepared-dataset layout). Ambiguous counts should pass
        # channel_names explicitly (the engine threads it from the
        # datamodule's configuration).
        count = n_channels
        if count == len(SAT_VARIABLE_NAMES):
            channel_names = SAT_VARIABLE_NAMES
        elif count < len(SAT_VARIABLE_NAMES):
            channel_names = SAT_VARIABLE_NAMES[1 : 1 + count]
        else:
            raise ValueError(
                f"cannot infer satellite channel stats for {count} channels; "
                "pass channel_names"
            )
    if len(channel_names) != n_channels:
        raise ValueError(
            f"satellite data has {n_channels} channels but channel_names "
            f"has {len(channel_names)}"
        )
    return batch.replace(
        satellite=_decode_group(batch.satellite, channel_names, crop)
    )


def stack_timesteps_as_channels(video: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) → (B, C·T, H, W): the experiment-001 input layout
    (reference ``experiments/001...py:273-274``)."""
    batch, channels, timesteps, height, width = video.shape
    return video.reshape(batch, channels * timesteps, height, width)
