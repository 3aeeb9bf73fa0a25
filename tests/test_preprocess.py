"""Fused preprocessing + visualization tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from predict_pv_yield_tpu.consts import SAT_MEAN, SAT_STD, SAT_VARIABLE_NAMES
from predict_pv_yield_tpu.data.batch import Batch, SatelliteBatch
from predict_pv_yield_tpu.data.preprocess import (
    channel_stats,
    decode_satellite,
    preprocess_batch,
    stack_timesteps_as_channels,
)


def test_decode_matches_reference_formula():
    """(x − SAT_MEAN)/SAT_STD per channel (reference netcdf_dataset.py:96-101)."""
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1023, size=(2, 12, 3, 8, 8), dtype=np.int16)
    mean, std = channel_stats(SAT_VARIABLE_NAMES)
    decoded = np.asarray(decode_satellite(jnp.asarray(raw), mean, std))
    expected = (raw.astype(np.float32) - SAT_MEAN[None, :, None, None, None]) / SAT_STD[
        None, :, None, None, None
    ]
    np.testing.assert_allclose(decoded, expected, rtol=1e-5)


def test_decode_missing_and_crop():
    raw = np.full((1, 2, 1, 8, 8), -1, dtype=np.int16)
    mean, std = channel_stats(SAT_VARIABLE_NAMES[:2])
    decoded = decode_satellite(jnp.asarray(raw), mean, std, crop=4)
    assert decoded.shape == (1, 2, 1, 4, 4)
    assert float(jnp.abs(decoded).max()) == 0.0  # missing → 0 after normalise


def test_crop_larger_than_image_raises():
    raw = np.full((1, 2, 1, 8, 8), 3, dtype=np.int16)
    mean, std = channel_stats(SAT_VARIABLE_NAMES[:2])
    with pytest.raises(ValueError, match="crop 12px exceeds"):
        decode_satellite(jnp.asarray(raw), mean, std, crop=12)


def test_preprocess_batch_noop_for_float():
    batch = Batch(satellite=SatelliteBatch(data=jnp.zeros((1, 2, 3, 4, 4))))
    assert preprocess_batch(batch) is batch


def test_preprocess_batch_int16():
    raw = jnp.asarray(np.ones((1, 3, 2, 8, 8), dtype=np.int16) * 100)
    batch = Batch(satellite=SatelliteBatch(data=raw))
    out = preprocess_batch(batch)
    assert out.satellite.data.dtype == jnp.float32


def test_stack_timesteps():
    video = jnp.zeros((2, 3, 5, 8, 8))
    stacked = stack_timesteps_as_channels(video)
    assert stacked.shape == (2, 15, 8, 8)


def test_plot_batch_results(tmp_path):
    from predict_pv_yield_tpu.visualization import plot_batch_results

    y = np.random.default_rng(0).uniform(size=(4, 10)).astype(np.float32)
    y_hat = y[:, -4:] + 0.1
    figure = plot_batch_results("conv3d", y, y_hat)
    path = str(tmp_path / "plot.html")
    figure.write_html(path)
    assert os.path.getsize(path) > 1000
    with open(path) as fh:
        content = fh.read()
    assert "conv3d" in content and "base64" in content


def test_hrv_group_decoded_too():
    """A raw int16 hrvsatellite group is decoded with the HRV channel stats
    in the same fused pass (HRV lives on its own grid as its own group)."""
    import jax.numpy as jnp

    from predict_pv_yield_tpu.consts import SAT_MEAN, SAT_STD, SAT_VARIABLE_NAMES
    from predict_pv_yield_tpu.data.batch import Batch, HRVSatelliteBatch, SatelliteBatch
    from predict_pv_yield_tpu.data.preprocess import preprocess_batch

    rng = np.random.default_rng(0)
    sat = rng.integers(-1, 1023, (2, 1, 3, 4, 4)).astype(np.int16)
    hrv = rng.integers(-1, 1023, (2, 1, 3, 8, 8)).astype(np.int16)
    batch = Batch(
        satellite=SatelliteBatch(data=jnp.asarray(sat)),
        hrvsatellite=HRVSatelliteBatch(data=jnp.asarray(hrv)),
    )
    out = preprocess_batch(batch, channel_names=["IR_016"])
    assert out.hrvsatellite.data.dtype == jnp.float32
    hrv_idx = SAT_VARIABLE_NAMES.index("HRV")
    expected = (hrv.astype(np.float32) - SAT_MEAN[hrv_idx]) / SAT_STD[hrv_idx]
    expected[hrv == -1] = 0.0
    np.testing.assert_allclose(np.asarray(out.hrvsatellite.data), expected, rtol=1e-5)


def test_hrv_decoded_without_satellite_group():
    """HRV-only batches (satellite group absent or already float) still get
    the fused int16 decode."""
    import jax.numpy as jnp

    from predict_pv_yield_tpu.data.batch import Batch, HRVSatelliteBatch
    from predict_pv_yield_tpu.data.preprocess import preprocess_batch

    rng = np.random.default_rng(1)
    hrv = rng.integers(-1, 1023, (2, 1, 3, 8, 8)).astype(np.int16)
    batch = Batch(hrvsatellite=HRVSatelliteBatch(data=jnp.asarray(hrv)))
    out = preprocess_batch(batch)
    assert out.hrvsatellite.data.dtype == jnp.float32
    assert float(jnp.abs(out.hrvsatellite.data).max()) < 50  # normalised scale
