"""Channel-stats streaming accumulator vs direct nan-reductions.

The reference derives SAT_MEAN/SAT_STD by xarray nan-aware reductions over
the decoded archive (``mean_and_std_of_satellite_imagery.ipynb`` cells
6–11); the gate here is that the single-pass streaming accumulator matches
a direct whole-array ``np.nan{mean,std,min,max}`` computation exactly,
including the −1 decode and ddof=0 std.
"""

import numpy as np
import pytest

from predict_pv_yield_tpu.data.channel_stats import (
    ChannelStatsAccumulator,
    compute_channel_stats,
)
from predict_pv_yield_tpu.data.zarr_reader import open_zarr, write_zarr


def _reference_stats(data: np.ndarray):
    """The notebook's computation, directly: float32, −1→NaN, reduce."""
    decoded = data.astype(np.float32)
    decoded = np.where(data == -1, np.nan, decoded).astype(np.float64)
    axes = tuple(range(data.ndim - 1))
    return {
        "mean": np.nanmean(decoded, axis=axes),
        "std": np.nanstd(decoded, axis=axes),  # ddof=0, xarray default
        "min": np.nanmin(decoded, axis=axes),
        "max": np.nanmax(decoded, axis=axes),
        "count": (~np.isnan(decoded)).sum(axis=axes),
    }


def test_streaming_matches_direct_int16():
    rng = np.random.default_rng(0)
    data = rng.integers(-1, 1023, size=(40, 8, 9, 3)).astype(np.int16)
    # dense missing-data patches, like real off-disc satellite pixels
    data[5:9, :4] = -1
    expected = _reference_stats(data)

    acc = ChannelStatsAccumulator(3)
    for start in range(0, 40, 7):  # slab edge not dividing the length
        acc.update(data[start : start + 7])
    result = acc.result()

    for i, name in enumerate(["0", "1", "2"]):
        assert result[name]["count"] == expected["count"][i]
        np.testing.assert_allclose(result[name]["mean"], expected["mean"][i], rtol=1e-12)
        np.testing.assert_allclose(result[name]["std"], expected["std"][i], rtol=1e-9)
        assert result[name]["min"] == expected["min"][i]
        assert result[name]["max"] == expected["max"][i]


def test_channel_axis_first_and_names():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(10, 2, 6, 6)).astype(np.float32)  # (T, C, H, W)
    acc = ChannelStatsAccumulator(2)
    acc.update(data, channel_axis=1)
    result = acc.result(channel_names=["HRV", "IR_016"])
    np.testing.assert_allclose(
        result["HRV"]["mean"], data[:, 0].mean(dtype=np.float64), rtol=1e-12
    )
    np.testing.assert_allclose(
        result["IR_016"]["std"], data[:, 1].astype(np.float64).std(), rtol=1e-9
    )
    with pytest.raises(ValueError):
        acc.result(channel_names=["just_one"])


def test_empty_slab_and_empty_array():
    acc = ChannelStatsAccumulator(2)
    acc.update(np.zeros((0, 4, 4, 2), dtype=np.int16))  # no-op, no crash
    assert acc.result()["0"]["count"] == 0
    stats = compute_channel_stats(np.zeros((0, 4, 4, 2), dtype=np.int16))
    assert stats["0"]["count"] == 0 and np.isnan(stats["0"]["mean"])


def test_all_missing_channel_reports_nan():
    data = np.full((4, 3, 3, 1), -1, dtype=np.int16)
    acc = ChannelStatsAccumulator(1)
    acc.update(data)
    stats = acc.result()["0"]
    assert stats["count"] == 0
    assert all(np.isnan(stats[k]) for k in ("mean", "std", "min", "max"))


def test_compute_channel_stats_over_zarr(tmp_path):
    """End to end over a real zarr store, chunk-aligned slabs by default."""
    rng = np.random.default_rng(2)
    data = rng.integers(-1, 500, size=(24, 10, 10, 2)).astype(np.int16)
    store = str(tmp_path / "archive.zarr")
    write_zarr(store, data, chunks=(6, 10, 10, 2))

    stats = compute_channel_stats(open_zarr(store), channel_names=["a", "b"])
    expected = _reference_stats(data)
    for i, name in enumerate(["a", "b"]):
        np.testing.assert_allclose(stats[name]["mean"], expected["mean"][i], rtol=1e-12)
        np.testing.assert_allclose(stats[name]["std"], expected["std"][i], rtol=1e-9)
        assert stats[name]["count"] == expected["count"][i]
