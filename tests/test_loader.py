"""On-disk datamodule path: shards + threaded prefetching loader."""

import subprocess
import sys
import os

import numpy as np
import pytest

from predict_pv_yield_tpu.data.loader import NetCDFDataModule, PrefetchingLoader
from predict_pv_yield_tpu.data.shards import ShardDataset


@pytest.fixture(scope="module")
def prepared_dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prepared"))
    repo = os.path.join(os.path.dirname(__file__), "..")
    subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "prepare_dataset.py"),
            "--out", out,
            "--fake",
            "--n-train", "6",
            "--n-test", "2",
            "--batch-size", "2",
            "--satellite-pixels", "8",
            "--nwp-pixels", "2",
        ],
        check=True,
        # strip the axon gate so the sitecustomize skips TPU registration
        # and JAX_PLATFORMS=cpu actually applies in the child (the round-1
        # dryrun failure mode, __graft_entry__.py)
        env={
            k: v
            for k, v in {**os.environ, "JAX_PLATFORMS": "cpu"}.items()
            if k != "PALLAS_AXON_POOL_IPS"
        },
        capture_output=True,
    )
    return out


def test_datamodule_reads_shards(prepared_dataset):
    dm = NetCDFDataModule(
        data_path=prepared_dataset,
        n_train_data=6,
        n_val_data=2,
        num_workers=2,
        fake_data=False,
    )
    assert dm.configuration.process.batch_size == 2
    batches = list(dm.train_dataloader())
    assert len(batches) == 6
    assert batches[0].satellite.data.shape[0] == 2
    val = list(dm.val_dataloader())
    assert len(val) == 2


def test_prefetching_loader_order_and_shuffle(prepared_dataset):
    dataset = ShardDataset(n_batches=6, src_path=os.path.join(prepared_dataset, "train"))

    sequential = PrefetchingLoader(dataset, num_workers=0)
    threaded = PrefetchingLoader(dataset, num_workers=3, prefetch_factor=2)
    a = [b.metadata.t0_datetime_utc[0] for b in sequential]
    b = [b.metadata.t0_datetime_utc[0] for b in threaded]
    # threaded prefetch preserves order exactly
    np.testing.assert_array_equal(a, b)

    shuffled = PrefetchingLoader(dataset, num_workers=2, shuffle=True, seed=1)
    first_epoch = [int(b.metadata.t0_datetime_utc[0]) for b in shuffled]
    second_epoch = [int(b.metadata.t0_datetime_utc[0]) for b in shuffled]
    assert sorted(first_epoch) == sorted(second_epoch) == sorted(int(x) for x in a)
    assert first_epoch != second_epoch  # reshuffled per epoch

    # set_epoch pins the permutation to a GLOBAL epoch number: a fresh
    # loader pinned to epoch 1 reproduces the original loader's second
    # epoch exactly (the engine uses this so resumed / freshly-reloaded
    # loaders replay the uninterrupted run's shuffle sequence)
    fresh = PrefetchingLoader(dataset, num_workers=2, shuffle=True, seed=1)
    fresh.set_epoch(1)
    pinned = [int(b.metadata.t0_datetime_utc[0]) for b in fresh]
    assert pinned == second_epoch


def test_prefetching_loader_propagates_worker_errors():
    class FlakyDataset:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            if i == 1:
                raise RuntimeError("corrupt shard")
            return i

    loader = PrefetchingLoader(FlakyDataset(), num_workers=2)
    with pytest.raises(RuntimeError, match="corrupt shard"):
        list(loader)


def test_prefetching_loader_stress_random_delays():
    """Concurrency hardening: 8 workers over 60 items with random per-item
    delays must deliver every item exactly once, in order, for several
    epochs — no deadlock against the bounded-prefetch backpressure."""
    import random
    import time

    from predict_pv_yield_tpu.data.loader import PrefetchingLoader

    class JitteryDataset:
        def __len__(self):
            return 60

        def __getitem__(self, i):
            time.sleep(random.random() * 0.004)
            return i

    loader = PrefetchingLoader(
        JitteryDataset(), num_workers=8, prefetch_factor=2, shuffle=True, seed=3
    )
    orders = [list(loader) for _ in range(3)]
    for order in orders:
        assert sorted(order) == list(range(60))
    # shuffle reshuffles per epoch
    assert orders[0] != orders[1]
    # and the declared order is reproduced exactly (not just as a set)
    loader2 = PrefetchingLoader(
        JitteryDataset(), num_workers=8, prefetch_factor=2, shuffle=True, seed=3
    )
    assert list(loader2) == orders[0]


@pytest.fixture(scope="module")
def zarr_store(tmp_path_factory):
    """Tiny satellite zarr group + PVLive CSV for streaming tests."""
    import pandas as pd

    from predict_pv_yield_tpu.data.zarr_reader import write_zarr

    root = tmp_path_factory.mktemp("stream")
    store = root / "sat.zarr"
    n, px = 120, 12
    t0 = np.datetime64("2020-06-01T08:00", "ns")
    times = t0 + np.arange(n) * np.timedelta64(5, "m")
    rng = np.random.default_rng(0)
    frames = rng.integers(-1, 1023, size=(n, px, px)).astype(np.int16)
    write_zarr(str(store / "data"), frames, chunks=(16, px, px))
    write_zarr(str(store / "time"), times, chunks=(n,))
    write_zarr(str(store / "x"), np.arange(px) * 2000.0 + 100_000.0, chunks=(px,))
    write_zarr(str(store / "y"), np.arange(px) * 2000.0 + 500_000.0, chunks=(px,))
    gsp_times = np.datetime64("2020-06-01T07:30", "ns") + np.arange(24) * np.timedelta64(30, "m")
    rows = [
        dict(datetime_gmt=str(t), gsp_id=gsp, generation_mw=float(rng.uniform(0, cap * 0.7)),
             capacity_mwp=cap)
        for t in gsp_times
        for gsp, cap in ((101, 120.0), (102, 340.0))
    ]
    csv = root / "pvlive.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(store), str(csv)


class TestZarrStreamDataModule:
    def test_streams_real_groups_with_synthetic_filler(self, zarr_store):
        from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule

        store, csv = zarr_store
        dm = ZarrStreamDataModule(
            zarr_path=store, gsp_csv=csv, batch_size=2,
            history_minutes=30, forecast_minutes=30,
            satellite_image_size_pixels=8, n_train_data=3, n_val_data=2,
            num_workers=2,
        )
        batches = list(dm.train_dataloader())
        assert len(batches) == 3
        b = batches[0]
        assert np.asarray(b.satellite.data).shape == (2, 1, 13, 8, 8)
        assert np.asarray(b.gsp.gsp_yield).shape == (2, 3, 1)
        assert (np.asarray(b.sun.sun_elevation_angle) > 0).all()  # June day
        assert b.nwp.data is not None  # synthetic filler keeps contracts
        # the imagery is the ARCHIVE's pixels, not synthetic filler: map the
        # batch's datetime index back to archive frame numbers and compare
        # the centre crop (median coord -> pixel 5, half=4 -> rows/cols 1..9)
        t0 = np.datetime64("2020-06-01T08:00", "ns").astype(np.int64)
        step = np.timedelta64(5, "m").astype("timedelta64[ns]").astype(np.int64)
        times_idx = (np.asarray(b.satellite.datetime_index)[0] - t0) // step
        rng_check = np.random.default_rng(0)
        frames = rng_check.integers(-1, 1023, size=(120, 12, 12)).astype(np.int16)
        expected = frames[times_idx.astype(int), 1:9, 1:9].astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(b.satellite.data)[0, 0], expected
        )

    def test_deterministic_epochs_and_heldout_val_tail(self, zarr_store):
        from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule

        store, csv = zarr_store
        dm = ZarrStreamDataModule(
            zarr_path=store, gsp_csv=csv, batch_size=2, history_minutes=30,
            forecast_minutes=30, satellite_image_size_pixels=8,
            n_train_data=2, n_val_data=1, num_workers=2,
        )
        first = list(dm.train_dataloader())[0]
        again = list(dm.train_dataloader())[0]
        np.testing.assert_array_equal(
            np.asarray(first.satellite.data), np.asarray(again.satellite.data)
        )
        # the RANDOM target draws (which GSP) ride the per-index rng too —
        # targets must be identical across epochs, not just imagery
        np.testing.assert_array_equal(
            np.asarray(first.gsp.gsp_id), np.asarray(again.gsp.gsp_id)
        )
        np.testing.assert_array_equal(
            np.asarray(first.gsp.gsp_yield), np.asarray(again.gsp.gsp_yield)
        )
        train_max = max(
            np.asarray(b.satellite.datetime_index).max()
            for b in dm.train_dataloader()
        )
        val_min = min(
            np.asarray(b.satellite.datetime_index).min()
            for b in dm.val_dataloader()
        )
        assert train_max < val_min  # archive tail is held out

    def test_whole_archive_training_without_test_tail(self, zarr_store):
        """test_fraction=0 trains on the full archive; only asking for the
        (empty) val split errors, and with a pointed message."""
        from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule

        store, _ = zarr_store
        dm = ZarrStreamDataModule(
            zarr_path=store, batch_size=2, history_minutes=30,
            forecast_minutes=30, satellite_image_size_pixels=8,
            n_train_data=1, n_val_data=1, num_workers=1, test_fraction=0.0,
        )
        assert len(list(dm.train_dataloader())) == 1
        with pytest.raises(ValueError, match="test split.*test_fraction"):
            dm.val_dataloader()

    def test_filler_targets_vary_per_index_without_gsp_source(self, zarr_store):
        """The cached shape-completeness filler must NOT freeze the training
        target: without a GSP source the (tiny) gsp/pv yield arrays are
        redrawn per index from the per-index rng. A constant target batch
        repeated every index lets the model memorise it and train loss
        collapses — a false 'it's learning' signal (round-4 review)."""
        from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule

        store, _ = zarr_store
        dm = ZarrStreamDataModule(
            zarr_path=store, batch_size=2, history_minutes=30,
            forecast_minutes=30, satellite_image_size_pixels=8,
            n_train_data=2, n_val_data=1, num_workers=1, test_fraction=0.0,
        )
        batches = list(dm.train_dataloader())
        y0 = np.asarray(batches[0].gsp.gsp_yield)
        y1 = np.asarray(batches[1].gsp.gsp_yield)
        assert not np.array_equal(y0, y1), "filler target frozen across indices"
        p0 = np.asarray(batches[0].pv.pv_yield)
        p1 = np.asarray(batches[1].pv.pv_yield)
        assert not np.array_equal(p0, p1), "filler pv_yield frozen across indices"
        # still deterministic per index across epochs
        again = list(dm.train_dataloader())
        np.testing.assert_array_equal(y0, np.asarray(again[0].gsp.gsp_yield))


class TestZarrStreamNWP:
    def test_streams_real_nwp_grids(self, zarr_store, tmp_path):
        """nwp_zarr_path: batch.nwp.data carries provenance-exact archive
        grids (freshest-run per hourly target, frozen after ceil(t0),
        centre-cropped) instead of the synthetic filler."""
        from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule
        from tests.test_sources import _expected_nwp_value, _write_nwp_store

        store, _ = zarr_store
        nwp_store = tmp_path / "nwp.zarr"
        nwp_store.mkdir()
        _, init_times = _write_nwp_store(nwp_store)

        dm = ZarrStreamDataModule(
            zarr_path=store, nwp_zarr_path=str(nwp_store), batch_size=2,
            history_minutes=30, forecast_minutes=30,
            satellite_image_size_pixels=8, nwp_image_size_pixels=4,
            n_train_data=2, n_val_data=1, num_workers=1,
        )
        assert dm.configuration.input_data.nwp.nwp_image_size_pixels == 4
        assert len(dm.configuration.input_data.nwp.nwp_channels) == 3

        batch = next(iter(dm.train_dataloader()))
        nwp = np.asarray(batch.nwp.data)
        # T60 = ceil(30/60) + 30//60 + 1 = 2 hourly targets
        assert nwp.shape == (2, 3, 2, 4, 4)
        target_time = np.asarray(batch.nwp.target_time)
        t0s = np.asarray(batch.metadata.t0_datetime_utc)
        for b in range(2):
            t0 = t0s[b].astype("datetime64[ns]")
            for k in range(2):
                target = target_time[b, k].astype("datetime64[ns]")
                # archive-centre crop of the 24-grid: tie-low pixel 11,
                # half=2 -> crop starts at pixel 9
                expected = _expected_nwp_value(
                    init_times, target, t0, variable=0, y_idx=9, x_idx=9
                )
                np.testing.assert_allclose(
                    nwp[b, 0, k, 0, 0], expected, rtol=0,
                    err_msg=f"b={b} k={k}",
                )
