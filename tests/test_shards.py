"""Batch-shard round-trip + map-style dataset semantics."""

import numpy as np
import pytest

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.data.shards import ShardDataset, read_shard, write_shard


def test_shard_roundtrip(configuration, tmp_path):
    batch = FakeDataset(configuration=configuration)[0]
    path = write_shard(str(tmp_path), 0, batch)
    restored = read_shard(path)
    np.testing.assert_array_equal(batch.satellite.data, restored.satellite.data)
    np.testing.assert_array_equal(batch.gsp.gsp_datetime_index, restored.gsp.gsp_datetime_index)
    np.testing.assert_array_equal(
        batch.metadata.t0_datetime_utc, restored.metadata.t0_datetime_utc
    )


def test_shard_dataset(configuration, tmp_path):
    ds_fake = FakeDataset(configuration=configuration, length=3)
    for i in range(3):
        write_shard(str(tmp_path), i, ds_fake[i])

    ds = ShardDataset(n_batches=3, src_path=str(tmp_path), configuration=configuration)
    assert len(ds) == 3
    batch = ds[1]
    np.testing.assert_array_equal(batch.pv.pv_yield, ds_fake[1].pv.pv_yield)
    with pytest.raises(IndexError):
        ds[3]


def test_raw_shard_roundtrip(tmp_path, configuration):
    """The flat raw format (fmt='raw'): magic + JSON index + aligned
    payloads, read back as zero-copy mmap views."""
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.shards import ShardDataset, read_shard, write_shard

    batch = fake_batch(configuration, np.random.default_rng(3))
    raw = np.random.default_rng(3).integers(
        -1, 1023, size=batch.satellite.data.shape, dtype=np.int16
    )
    batch = batch.replace(satellite=batch.satellite.replace(data=raw))
    path = write_shard(str(tmp_path), 0, batch, fmt="raw")
    assert path.endswith(".shard")

    loaded = read_shard(path)
    np.testing.assert_array_equal(loaded.satellite.data, raw)
    assert loaded.satellite.data.dtype == np.int16
    np.testing.assert_allclose(loaded.pv.pv_yield, batch.pv.pv_yield)
    # payload_start is padded to 64 bytes, so the documented per-array
    # alignment holds in FILE offsets and the mmap views are aligned
    for group in ("satellite", "pv", "gsp", "nwp"):
        for field, value in vars(getattr(loaded, group)).items():
            if isinstance(value, np.ndarray):
                assert value.ctypes.data % 64 == 0, (group, field)
                assert value.flags.aligned, (group, field)

    # dataset auto-detects the raw extension
    ds = ShardDataset(n_batches=1, src_path=str(tmp_path))
    np.testing.assert_array_equal(ds[0].satellite.data, raw)


def test_shard_dataset_remote_fetch(configuration, tmp_path):
    """Remote (fsspec) path: shards are fetched into tmp_path — which is
    created on demand — read, and cleaned up. Uses file:// so the real
    fetch/retry machinery runs (fsspec is present in this image)."""
    pytest.importorskip("fsspec")
    src = tmp_path / "store"
    src.mkdir()
    ds_fake = FakeDataset(configuration=configuration, length=2)
    for i in range(2):
        write_shard(str(src), i, ds_fake[i])

    scratch = tmp_path / "scratch" / "nested"  # intentionally nonexistent
    ds = ShardDataset(
        n_batches=2,
        src_path=f"file://{src}",
        configuration=configuration,
        tmp_path=str(scratch),
    )
    batch = ds[1]
    np.testing.assert_array_equal(batch.pv.pv_yield, ds_fake[1].pv.pv_yield)
    # the fetched copy is removed after reading; the scratch dir was created
    assert scratch.exists()
    assert not list(scratch.iterdir())
