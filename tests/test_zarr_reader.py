"""First-party zarr v2 reader round-trips + slicing semantics."""

import numpy as np
import pytest

from predict_pv_yield_tpu.data.zarr_reader import ZarrArray, open_zarr, write_zarr


@pytest.fixture()
def store(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(-1, 1023, size=(10, 16, 24), dtype=np.int16)
    path = str(tmp_path / "test.zarr")
    write_zarr(path, data, chunks=(4, 8, 8))
    return path, data


def test_full_read(store):
    path, data = store
    arr = open_zarr(path)
    assert arr.shape == (10, 16, 24)
    assert arr.dtype == np.int16
    np.testing.assert_array_equal(arr[:], data)


def test_window_read(store):
    path, data = store
    arr = ZarrArray(path)
    np.testing.assert_array_equal(arr[2:7], data[2:7])
    np.testing.assert_array_equal(arr[3:9, 5:13, 2:20], data[3:9, 5:13, 2:20])
    np.testing.assert_array_equal(arr[5], data[5])
    np.testing.assert_array_equal(arr[5, :, 3], data[5, :, 3])


def test_uncompressed_and_missing_chunks(tmp_path):
    data = np.arange(64, dtype=np.float32).reshape(8, 8)
    path = str(tmp_path / "raw.zarr")
    write_zarr(path, data, chunks=(4, 4), compress=False)
    arr = ZarrArray(path)
    np.testing.assert_array_equal(arr[:], data)

    # delete a chunk -> fill_value
    import os

    os.remove(os.path.join(path, "0.0"))
    np.testing.assert_array_equal(ZarrArray(path)[:4, :4], np.zeros((4, 4)))


def test_unsupported_compressor(tmp_path):
    import json, os

    path = tmp_path / "snappy.zarr"
    path.mkdir()
    (path / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [4],
                "chunks": [4],
                "dtype": "<f4",
                "order": "C",
                "fill_value": 0,
                "compressor": {"id": "snappy"},
            }
        )
    )
    with pytest.raises(ValueError, match="blosc"):
        ZarrArray(str(path))


def test_len_empty_slice_and_filters(tmp_path):
    """numpy drop-in contract: len() is the leading axis and a start>stop
    slice is empty; declared filters fail loudly instead of silently
    decoding un-unfiltered bytes (round-3 review)."""
    import json

    from predict_pv_yield_tpu.data.zarr_reader import write_zarr

    data = np.arange(24, dtype=np.int16).reshape(6, 4)
    write_zarr(str(tmp_path / "a"), data, chunks=(2, 4))
    z = open_zarr(str(tmp_path / "a"))
    assert len(z) == 6
    assert z[5:2].shape == (0, 4)
    meta_path = tmp_path / "a" / ".zarray"
    meta = json.loads(meta_path.read_text())
    meta["filters"] = [{"id": "delta", "dtype": "<i2"}]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="filters"):
        open_zarr(str(tmp_path / "a"))
