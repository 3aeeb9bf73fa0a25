"""DataSource lineage (nb28 cells 83-110) — `data/sources.py`."""

import os
import subprocess
import sys

import numpy as np
import pytest

from predict_pv_yield_tpu.data.sources import (
    BadData,
    NWPDataSource,
    PVDataSource,
    SampleGenerator,
    SatelliteDataSource,
    collate_samples,
    crop_square,
    datetime_features,
)


def _grid(start: str, n: int, minutes: int = 5) -> np.ndarray:
    t0 = np.datetime64(start, "ns")
    return t0 + np.arange(n) * np.timedelta64(minutes, "m")


class TestSatelliteDataSource:
    def test_window_slice_inclusive_and_t0_unused(self):
        times = _grid("2020-06-01T10:00", 20)
        data = np.arange(20 * 4 * 4, dtype=np.float32).reshape(20, 4, 4)
        src = SatelliteDataSource(data, times)
        s = src.get_sample(times[3], times[7], t0=times[5])
        assert s["sat_data"].shape == (5, 4, 4)
        np.testing.assert_array_equal(s["sat_data"], data[3:8])
        np.testing.assert_array_equal(s["sat_datetimes"], times[3:8])

    def test_gap_in_window_raises_baddata(self):
        times = np.concatenate([_grid("2020-06-01T10:00", 5),
                                _grid("2020-06-01T11:00", 5)])
        src = SatelliteDataSource(np.zeros((10, 2, 2)), times)
        with pytest.raises(BadData, match="gap-free"):
            src.get_chunk(times[3], times[6])

    def test_centre_crop(self):
        times = _grid("2020-06-01T10:00", 3)
        data = np.arange(3 * 8 * 8, dtype=np.float32).reshape(3, 8, 8)
        x = np.arange(8) * 2000.0 + 100_000.0  # eastings per column
        y = np.arange(8) * 2000.0 + 500_000.0
        src = SatelliteDataSource(data, times, x=x, y=y, image_size_pixels=4)
        s = src.get_sample(times[0], times[2], t0=times[1],
                           centre=(x[4], y[4]))
        assert s["sat_data"].shape == (3, 4, 4)
        np.testing.assert_array_equal(s["sat_x"], x[2:6])
        np.testing.assert_array_equal(s["sat_y"], y[2:6])

    def test_length_mismatch_rejected(self):
        with pytest.raises(ValueError, match="datetimes length"):
            SatelliteDataSource(np.zeros((4, 2, 2)), _grid("2020-01-01", 5))

    def test_non_square_archive_crop_checks_both_axes(self):
        """A crop larger than EITHER axis is BadData — the height axis used
        to be unchecked, silently emitting wrong-height images."""
        times = _grid("2020-06-01T10:00", 3)
        data = np.zeros((3, 4, 8), dtype=np.float32)  # H=4 < W=8
        src = SatelliteDataSource(data, times, image_size_pixels=6)
        with pytest.raises(BadData, match="smaller than the 6px crop"):
            src.get_chunk(times[0], times[2])
        src4 = SatelliteDataSource(data, times, image_size_pixels=4)
        s = src4.get_chunk(times[0], times[2])
        assert s["sat_data"].shape == (3, 4, 4)

    def test_centre_without_image_size_is_clear_error(self):
        times = _grid("2020-06-01T10:00", 3)
        px = 8
        src = SatelliteDataSource(
            np.zeros((3, px, px)), times,
            x=np.arange(px) * 1.0, y=np.arange(px) * 1.0,
        )
        with pytest.raises(ValueError, match="image_size_pixels"):
            src.get_chunk(times[0], times[2], centre=(3.0, 3.0))


class TestCropSquare:
    def test_out_of_bounds_raises(self):
        x = np.arange(6) * 1000.0
        y = np.arange(6) * 1000.0
        with pytest.raises(BadData, match="outside the archive"):
            crop_square(np.zeros((6, 6)), x, y, centre_x=0.0, centre_y=0.0,
                        size_pixels=4)


class TestNWPDataSource:
    def _source(self, n_init=8, **kwargs):
        init = _grid("2020-06-01T00:00", n_init, minutes=60)
        # data[i, j, 0] = 100*i + j so the (init, step) gather is legible
        data = (100 * np.arange(n_init)[:, None] + np.arange(6)[None, :])
        data = data[:, :, None, None, None] * np.ones((1, 1, 1, 2, 2))
        return NWPDataSource(data.astype(np.float32), init, **kwargs), init

    def test_freshest_run_per_target_and_frozen_future(self):
        src, init = self._source(static_targets=False)
        start, t0, end = init[2], init[3], init[5]
        s = src.get_sample(start, end, t0)
        # targets 02..05; history targets use their own hour's run, future
        # (04,05) frozen on ceil(t0)=03:00's run → values 202, 303, 301, 302
        assert s["nwp"].shape == (4, 1, 2, 2)
        np.testing.assert_array_equal(
            s["nwp"][:, 0, 0, 0], [200.0, 300.0, 301.0, 302.0]
        )
        np.testing.assert_array_equal(s["nwp_target_times"], init[2:6])

    def test_static_targets_extend_frozen_run(self):
        src, init = self._source()  # static_targets default
        start, t0, end = init[2], init[3], init[5]
        s = src.get_sample(start, end, t0)
        # 3h window → ceil(3)+2 = 5 targets; the 5th is 06:00 from the
        # frozen 03:00 run (step 3h → value 303)
        assert s["nwp"].shape == (5, 1, 2, 2)
        np.testing.assert_array_equal(
            s["nwp"][:, 0, 0, 0], [200.0, 300.0, 301.0, 302.0, 303.0]
        )
        assert s["nwp_target_times"][-1] == init[6]
        assert s["nwp_init_times"][-1] == init[3]

    def test_static_targets_equal_length_across_misaligned_windows(self):
        src, init = self._source()
        m = np.timedelta64(5, "m")
        shapes = set()
        for offset in range(0, 12):  # start frac 0..55 min
            start = init[1] + offset * m
            end = start + np.timedelta64(90, "m")
            t0 = start + np.timedelta64(30, "m")
            shapes.add(src.get_sample(start, end, t0)["nwp"].shape)
        assert len(shapes) == 1  # ceil(1.5)+2 = 4 targets, always
        assert shapes.pop()[0] == 4

    def test_step_overflow_raises_baddata(self):
        init = _grid("2020-06-01T00:00", 1, minutes=60)
        data = np.zeros((1, 2, 1, 2, 2), dtype=np.float32)  # only 2 steps
        src = NWPDataSource(data, init)
        with pytest.raises(BadData, match="exceeds the archive"):
            src.get_sample(init[0], init[0] + np.timedelta64(4, "h"), init[0])

    def test_get_chunk_floors_to_3h(self):
        init = _grid("2020-06-01T00:00", 12, minutes=180)  # 3-hourly runs
        data = np.arange(12, dtype=np.float32)[:, None, None, None, None] * np.ones(
            (1, 2, 1, 2, 2), dtype=np.float32
        )
        src = NWPDataSource(data, init, step_duration=np.timedelta64(3, "h"))
        chunk = src.get_chunk(
            np.datetime64("2020-06-01T04:10"), np.datetime64("2020-06-01T10:59")
        )
        # floor3h(04:10)=03:00, floor3h(10:59)=09:00 → runs 03,06,09
        np.testing.assert_array_equal(chunk["nwp_init_times"], init[1:4])


class TestPVDataSource:
    def test_nan_systems_dropped_and_one_chosen(self):
        times = _grid("2020-06-01T10:00", 10)
        power = np.random.default_rng(0).uniform(0, 1, size=(10, 3)).astype(np.float32)
        power[4, 0] = np.nan  # system 0 has a hole
        src = PVDataSource(
            power, times, system_ids=np.array([11, 22, 33]),
            x=np.array([1.0, 2.0, 3.0]), y=np.array([4.0, 5.0, 6.0]),
            rng=np.random.default_rng(1),
        )
        s = src.get_sample(times[0], times[9], t0=times[5])
        assert s["pv_system_row_number"] in (1, 2)
        assert s["pv_system_id"] == [11, 22, 33][s["pv_system_row_number"]]
        np.testing.assert_array_equal(
            s["pv_yield"], power[:, s["pv_system_row_number"]]
        )
        assert s["pv_location_x"] == [1.0, 2.0, 3.0][s["pv_system_row_number"]]

    def test_all_nan_raises_baddata(self):
        times = _grid("2020-06-01T10:00", 4)
        power = np.full((4, 2), np.nan, dtype=np.float32)
        src = PVDataSource(power, times, system_ids=np.array([1, 2]))
        with pytest.raises(BadData, match="missing data"):
            src.get_chunk(times[0], times[3])

    def test_from_passiv_csv(self, tmp_path):
        import pandas as pd

        times = _grid("2020-06-01T10:00", 8)
        rows = []
        # deterministic per-system watt ramps so the per-system
        # normalisation is checkable exactly (a cross-wired capacity would
        # change the VALUES, not just their range)
        for ti, t in enumerate(times):
            rows.append(dict(timestamp=str(t), ss_id=1001,
                             instantaneous_power_w=float(400 * ti)))
            rows.append(dict(timestamp=str(t), ss_id=1002,
                             instantaneous_power_w=float(600 * ti)))
        power_csv = tmp_path / "power.csv"
        pd.DataFrame(rows).to_csv(power_csv, index=False)
        meta_csv = tmp_path / "meta.csv"
        pd.DataFrame(
            [
                dict(ss_id=1001, kwp=4.0, latitude=51.5074, longitude=-0.1278),
                dict(ss_id=1002, kwp=3.0, latitude=52.2053, longitude=0.1218),
                dict(ss_id=9999, kwp=1.0, latitude=50.0, longitude=-5.0),
            ]
        ).to_csv(meta_csv, index=False)
        src = PVDataSource.from_passiv_csv(str(power_csv), str(meta_csv))
        assert list(src.system_ids) == [1001, 1002]  # 9999 has no power data
        # exact per-system normalisation: 400*ti/4000 and 600*ti/3000
        np.testing.assert_allclose(src.power[:, 0], 0.1 * np.arange(8))
        np.testing.assert_allclose(src.power[:, 1], 0.2 * np.arange(8))
        s = src.get_chunk(times[0], times[7])
        assert s["pv_yield"].shape == (8,)
        # locations converted via the first-party geodesy: London easting
        # ~530k, Cambridge ~545k; a centre strictly NEARER each system (not
        # on top of it) must select that system
        near_1001 = (float(src.x[0]) + 5_000.0, float(src.y[0]) - 5_000.0)
        assert src.get_chunk(times[0], times[7], centre=near_1001)[
            "pv_system_id"
        ] == 1001
        near_1002 = (float(src.x[1]) - 5_000.0, float(src.y[1]) + 5_000.0)
        assert src.get_chunk(times[0], times[7], centre=near_1002)[
            "pv_system_id"
        ] == 1002
        assert 500_000 < src.x[0] < 560_000 and 150_000 < src.y[0] < 200_000

    def test_from_passiv_csv_generation_wh_is_energy_not_power(self, tmp_path):
        """generation_wh logs Wh per interval — a 3 kWp system at a steady
        1500 W writes 125 Wh per 5-minute row, and the yield must come out
        0.5, not 125/3000."""
        import pandas as pd

        times = _grid("2020-06-01T10:00", 6)  # 5-minute cadence
        rows = [
            dict(timestamp=str(t), ss_id=1001, generation_wh=125.0)
            for t in times
        ]
        power_csv = tmp_path / "power.csv"
        pd.DataFrame(rows).to_csv(power_csv, index=False)
        meta_csv = tmp_path / "meta.csv"
        pd.DataFrame([dict(ss_id=1001, kwp=3.0, x=0.0, y=0.0)]).to_csv(
            meta_csv, index=False
        )
        src = PVDataSource.from_passiv_csv(str(power_csv), str(meta_csv))
        np.testing.assert_allclose(src.power, 0.5)


class TestGSPSource:
    def _grid30(self, start: str, n: int):
        return _grid(start, n, minutes=30)

    def _source(self, **kwargs):
        times = self._grid30("2020-06-01T00:00", 48)
        rng = np.random.default_rng(0)
        power = rng.uniform(0, 100, size=(48, 4))
        capacity = np.array([200.0, 300.0, 400.0, 500.0])
        defaults = dict(
            power_mw=power, capacity_mwp=capacity, datetimes=times,
            gsp_ids=np.array([7, 11, 13, 17]),
            rng=np.random.default_rng(1),
        )
        defaults.update(kwargs)
        from predict_pv_yield_tpu.data.sources import GSPSource

        return GSPSource(**defaults), times, power, capacity

    def test_yield_is_power_over_capacity_on_aligned_grid(self):
        src, times, power, capacity = self._source()
        s = src.get_sample(times[4], times[7], t0=times[5])
        assert s["gsp_yield"].shape == (4, 1)
        np.testing.assert_array_equal(s["gsp_datetime_index"], times[4:8])
        row = int(np.flatnonzero(src.gsp_ids == s["gsp_id"][0])[0])
        np.testing.assert_allclose(
            s["gsp_yield"][:, 0],
            (power[4:8, row] / capacity[row]).astype(np.float32),
        )
        np.testing.assert_allclose(s["gsp_capacity"][:, 0], capacity[row])

    def test_misaligned_start_anchors_on_ceil30(self):
        src, times, _, _ = self._source()
        start = times[4] + np.timedelta64(10, "m")
        end = start + np.timedelta64(90, "m")
        s = src.get_chunk(start, end)
        # ceil30(start) = times[5]; 90//30+1 = 4 targets; last is <30 min
        # past end (static-shape rule)
        np.testing.assert_array_equal(s["gsp_datetime_index"], times[5:9])
        assert s["gsp_datetime_index"][-1] > end

    def test_nan_and_zero_capacity_dropped(self):
        capacity2d = np.tile([200.0, 300.0, 400.0, 500.0], (48, 1))
        capacity2d[:, 1] = 0.0
        src, times, power, _ = self._source(
            n_gsp_per_example=2, capacity_mwp=capacity2d
        )
        src.power[10, 0] = np.nan
        s = src.get_chunk(times[9], times[12])
        assert set(s["gsp_id"]) <= {13, 17}
        with pytest.raises(Exception, match="NaN-free"):
            src.n_gsp = 3
            src.get_chunk(times[9], times[12])

    def test_centre_picks_nearest_first(self):
        src, times, _, _ = self._source(
            x=np.array([0.0, 1000.0, 2000.0, 3000.0]),
            y=np.zeros(4),
            n_gsp_per_example=2,
        )
        s = src.get_chunk(times[0], times[3], centre=(2100.0, 0.0))
        assert list(s["gsp_id"]) == [13, 17]  # nearest, then next-nearest

    def test_archive_gap_raises_baddata(self):
        src, times, _, _ = self._source()
        with pytest.raises(BadData, match="lacks 30-minute"):
            src.get_chunk(times[46], times[47] + np.timedelta64(60, "m"))

    def test_from_pvlive_csv(self, tmp_path):
        import pandas as pd

        from predict_pv_yield_tpu.data.sources import GSPSource

        times = self._grid30("2020-06-01T00:00", 6)
        rows = []
        for t in times:
            for gsp, cap in ((1, 100.0), (2, 250.0)):
                rows.append(
                    dict(datetime_gmt=str(t), gsp_id=gsp,
                         generation_mw=10.0 * gsp, capacity_mwp=cap)
                )
        path = tmp_path / "pvlive.csv"
        pd.DataFrame(rows).to_csv(path, index=False)
        src = GSPSource.from_pvlive_csv(str(path))
        s = src.get_chunk(times[1], times[4])
        assert s["gsp_yield"].shape == (4, 1)
        gsp = int(s["gsp_id"][0])
        np.testing.assert_allclose(
            s["gsp_yield"][:, 0], 10.0 * gsp / (100.0 if gsp == 1 else 250.0)
        )

    def test_collates_into_gsp_group(self):
        src, times, _, _ = self._source()
        s = src.get_chunk(times[2], times[5])
        s.update(start_datetime=times[2], end_datetime=times[5],
                 t0_datetime=times[3])
        batch = collate_samples([s, s])
        assert batch.gsp.gsp_yield.shape == (2, 4, 1)
        assert batch.gsp.gsp_datetime_index.dtype == np.int64
        assert batch.gsp.gsp_id.dtype == np.int32


class TestSunSource:
    def test_sun_sample_merges_and_collates(self):
        from predict_pv_yield_tpu.data.sources import SunSource

        times = _grid("2020-06-01T10:00", 13)
        # ~central London easting/northing
        src = SunSource(easting=530_000.0, northing=180_000.0)
        s = src.get_sample(times[0], times[12], t0=times[6])
        assert s["sun_elevation_angle"].shape == (13,)
        assert (s["sun_elevation_angle"] > 30.0).all()  # June, late morning
        assert (s["sun_azimuth_angle"] > 100.0).all()
        s.update(start_datetime=times[0], end_datetime=times[12],
                 t0_datetime=times[6])
        batch = collate_samples([s])
        assert batch.sun.sun_elevation_angle.shape == (1, 13)


class TestDatetimeFeatures:
    def test_known_values(self):
        f = datetime_features(np.array(["2020-01-01T06:00", "2020-07-01T18:00"],
                                       dtype="datetime64[ns]"))
        # 06:00 → sin(2π·6/24)=1; day 1 → sin(2π/366)
        assert f["hour_of_day_sin"][0] == pytest.approx(1.0)
        assert f["hour_of_day_cos"][0] == pytest.approx(0.0, abs=1e-6)
        assert f["hour_of_day_sin"][1] == pytest.approx(-1.0)
        assert f["day_of_year_sin"][0] == pytest.approx(np.sin(2 * np.pi / 366))
        # 2020-07-01 is day 183 of the leap year
        assert f["day_of_year_sin"][1] == pytest.approx(
            np.sin(2 * np.pi * 183 / 366)
        )


class TestSampleGeneratorAndCollate:
    def _build(self, n_frames=64):
        times = _grid("2020-06-01T08:00", n_frames)
        rng = np.random.default_rng(0)
        sat = rng.uniform(0, 1023, size=(n_frames, 8, 8)).astype(np.float32)
        x = np.arange(8) * 2000.0 + 100_000.0
        y = np.arange(8) * 2000.0 + 500_000.0
        init = _grid("2020-06-01T00:00", 24, minutes=60)
        nwp = rng.standard_normal((24, 4, 2, 4, 4)).astype(np.float32)
        power = rng.uniform(0, 1, size=(n_frames, 5)).astype(np.float32)
        gen = SampleGenerator(
            sources=[
                SatelliteDataSource(sat, times, x=x, y=y),
                NWPDataSource(nwp, init),
                PVDataSource(power, times, system_ids=np.arange(5) + 100,
                             rng=np.random.default_rng(2)),
            ],
            datetimes=times,
            history_minutes=30,
            forecast_minutes=60,
            rng=np.random.default_rng(3),
        )
        return gen, times

    def test_samples_collate_to_batch(self):
        gen, times = self._build()
        samples = gen.sample(4)
        batch = collate_samples(samples)
        assert batch.satellite.data.shape == (4, 1, 19, 8, 8)  # 90min/5 + 1
        assert batch.satellite.datetime_index.dtype == np.int64
        assert batch.nwp.data.shape[0] == 4 and batch.nwp.data.shape[1] == 2
        assert batch.pv.pv_yield.shape == (4, 19, 1)
        assert batch.datetime.hour_of_day_sin.shape == (4, 19)
        assert batch.metadata.t0_datetime_utc.shape == (4,)
        # t0 sits history_minutes after each window start
        for s in samples:
            assert s["t0_datetime"] - s["start_datetime"] == np.timedelta64(30, "m")
            assert times[0] <= s["start_datetime"]
            assert s["end_datetime"] <= times[-1]

    def test_baddata_windows_are_retried(self):
        times = _grid("2020-06-01T08:00", 64)
        rng = np.random.default_rng(0)
        power = rng.uniform(0, 1, size=(64, 1)).astype(np.float32)
        power[32, 0] = np.nan  # poisons any window covering frame 32
        gen = SampleGenerator(
            sources=[PVDataSource(power, times, system_ids=np.array([7]),
                                  rng=np.random.default_rng(1))],
            datetimes=times,
            history_minutes=30,
            forecast_minutes=30,
            rng=np.random.default_rng(4),
        )
        samples = gen.sample(6)
        assert len(samples) == 6
        for s in samples:  # no sampled window contains the NaN frame
            assert not (
                s["start_datetime"] <= times[32] <= s["end_datetime"]
            )

    def test_exhausted_retries_raise(self):
        times = _grid("2020-06-01T08:00", 16)
        power = np.full((16, 1), np.nan, dtype=np.float32)
        gen = SampleGenerator(
            sources=[PVDataSource(power, times, system_ids=np.array([7]))],
            datetimes=times,
            history_minutes=15,
            forecast_minutes=15,
            max_retries=2,
        )
        with pytest.raises(BadData, match="gave up"):
            gen.sample(2)

    def test_key_collision_raises(self):
        gen, times = self._build()
        gen.sources.append(gen.sources[0])  # duplicate satellite source
        with pytest.raises(ValueError, match="redefines sample keys"):
            gen.get_sample(times[0], times[18], times[6])

    def test_location_driven_extraction(self):
        """SampleGenerator(locations=...): one OSGB location per example
        drives the satellite crop, the nearest-PV-system choice, and the
        solar angles (nowcasting_dataset's extraction loop)."""
        from predict_pv_yield_tpu.data.sources import SunSource

        times = _grid("2020-06-01T08:00", 64)
        rng = np.random.default_rng(0)
        px = 16
        sat = rng.uniform(0, 1023, size=(64, px, px)).astype(np.float32)
        x = np.arange(px) * 2000.0 + 100_000.0
        y = np.arange(px) * 2000.0 + 500_000.0
        power = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
        pv_x = np.array([x[3], x[8], x[12]])
        pv_y = np.array([y[3], y[8], y[12]])
        gen = SampleGenerator(
            sources=[
                SatelliteDataSource(sat, times, x=x, y=y, image_size_pixels=6),
                PVDataSource(power, times, system_ids=np.array([10, 20, 30]),
                             x=pv_x, y=pv_y),
                SunSource(easting=0.0, northing=0.0),  # fallback, unused
            ],
            datetimes=times,
            history_minutes=30,
            forecast_minutes=30,
            rng=np.random.default_rng(5),
            locations=np.stack([pv_x, pv_y], axis=1),
        )
        samples = gen.sample(6)
        for s in samples:
            cx, cy = s["centre_osgb"]
            # the chosen PV system is the one AT the drawn location
            row = s["pv_system_row_number"]
            assert (pv_x[row], pv_y[row]) == (cx, cy)
            assert s["pv_location_x"] == cx
            # satellite crop brackets the location
            assert s["sat_x"][0] <= cx <= s["sat_x"][-1]
            assert s["sat_y"][0] <= cy <= s["sat_y"][-1]
            assert s["sat_data"].shape[-2:] == (6, 6)
            # sun angles computed at the location: daytime June, GB-ish
            assert (s["sun_elevation_angle"] > 0).all()

    def test_prepare_dataset_samples_real_zarr_windows(self, tmp_path):
        """tools/prepare_dataset.py --satellite-zarr: shards carry real
        archive windows (exact value match at the recorded datetimes), the
        rest of the batch stays synthetic but shape-complete."""
        from predict_pv_yield_tpu.data.shards import read_shard, shard_filename
        from predict_pv_yield_tpu.data.zarr_reader import write_zarr

        store = tmp_path / "sat.zarr"
        n_frames, px = 80, 12
        times = _grid("2020-06-01T08:00", n_frames)
        rng = np.random.default_rng(0)
        # distinct per-frame constants make window identification exact
        frames = np.tile(
            np.arange(n_frames, dtype=np.int16)[:, None, None], (1, px, px)
        )
        frames += rng.integers(0, 3, size=frames.shape, dtype=np.int16)
        write_zarr(str(store / "data"), frames, chunks=(16, px, px))
        # CF-encoded time axis (xarray's int + units layout) — the tool
        # must decode via .zattrs, not misread raw ints as nanoseconds
        minutes = (
            times.astype("datetime64[ns]").astype(np.int64) // (60 * 10**9)
        )
        write_zarr(str(store / "time"), minutes, chunks=(n_frames,),
                   attrs={"units": "minutes since 1970-01-01"})
        write_zarr(str(store / "x"),
                   np.arange(px) * 2000.0 + 100_000.0, chunks=(px,))
        write_zarr(str(store / "y"),
                   np.arange(px) * 2000.0 + 500_000.0, chunks=(px,))

        out = tmp_path / "prepared"
        repo = os.path.join(os.path.dirname(__file__), "..")
        env = {
            k: v
            for k, v in {**os.environ, "JAX_PLATFORMS": "cpu"}.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }
        result = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "tools", "prepare_dataset.py"),
                "--out", str(out),
                "--satellite-zarr", str(store),
                "--n-train", "2", "--n-test", "1", "--batch-size", "2",
                "--satellite-pixels", "8", "--nwp-pixels", "2",
                "--history-minutes", "30", "--forecast-minutes", "30",
            ],
            env=env, capture_output=True, text=True,
        )
        assert result.returncode == 0, result.stderr

        batch = read_shard(str(out / "train" / shard_filename(0, "raw")))
        sat = np.asarray(batch.satellite.data)
        assert sat.shape == (2, 1, 13, 8, 8)  # 60min/5+1 frames, cropped
        dt = np.asarray(batch.satellite.datetime_index)
        for b in range(2):
            window_times = dt[b].astype("datetime64[ns]")
            assert (np.diff(window_times) == np.timedelta64(5, "m")).all()
            frame_idx = np.searchsorted(times, window_times)
            np.testing.assert_array_equal(times[frame_idx], window_times)
            # exact archive values at the cropped corner/centre coords
            x_idx = np.searchsorted(
                np.arange(px) * 2000.0 + 100_000.0, batch.satellite.x[b]
            )
            y_idx = np.searchsorted(
                np.arange(px) * 2000.0 + 500_000.0, batch.satellite.y[b]
            )
            expected = frames[np.ix_(frame_idx, y_idx, x_idx)]
            np.testing.assert_array_equal(sat[b, 0], expected.astype(np.float32))
        # real computed solar angles at the archive centre (June morning,
        # central-England coords → sun well above the horizon)
        sun = np.asarray(batch.sun.sun_elevation_angle)
        assert sun.shape == (2, 13)
        assert (sun > 10.0).all() and (sun < 65.0).all()
        az = np.asarray(batch.sun.sun_azimuth_angle)
        assert ((az > 60.0) & (az < 300.0)).all()  # morning→afternoon arc
        # synthetic groups still present and shaped
        assert batch.nwp.data.shape[0] == 2
        assert batch.gsp.gsp_yield is not None
        # configuration channel list follows the single-channel archive
        import yaml
        with open(out / "configuration.yaml") as fh:
            config = yaml.safe_load(fh)
        assert len(config["input_data"]["satellite"]["satellite_channels"]) == 1
        # train/test windows come from disjoint time partitions (the
        # held-out archive tail) — no train/test leakage
        test_batch = read_shard(str(out / "test" / shard_filename(0, "raw")))
        train_max = np.asarray(batch.satellite.datetime_index).max()
        test_min = np.asarray(test_batch.satellite.datetime_index).min()
        assert train_max < test_min

    def test_collate_channelled_satellite(self):
        times = _grid("2020-06-01T08:00", 7)
        sat = np.random.default_rng(0).standard_normal((7, 3, 4, 4)).astype(np.float32)
        src = SatelliteDataSource(sat, times)
        s = src.get_chunk(times[0], times[6])
        s.update(start_datetime=times[0], end_datetime=times[6], t0_datetime=times[3])
        batch = collate_samples([s, s])
        assert batch.satellite.data.shape == (2, 3, 7, 4, 4)


def _write_nwp_store(root, n_init=10, n_var=3, n_step=9, grid=24,
                     first_init="2020-06-01T00:00", cadence_h=3):
    """Zarr NWP store in the real-UKV axis order (init, variable, step, y, x)
    with CF-encoded init times, an hours step coordinate and OSGB coords.
    Values encode their own provenance exactly in float32:
    ``init_idx·10000 + step_idx·100 + variable + y_idx/4 + x_idx/64``."""
    from predict_pv_yield_tpu.data.zarr_reader import write_zarr

    i, v, s_, y, x = np.ix_(
        np.arange(n_init), np.arange(n_var), np.arange(n_step),
        np.arange(grid), np.arange(grid),
    )
    data = (i * 10000 + s_ * 100 + v + y / 4 + x / 64).astype(np.float32)
    write_zarr(str(root / "data"), data, chunks=(2, n_var, 3, grid, grid))
    init_hours = np.arange(n_init, dtype=np.float64) * cadence_h
    write_zarr(str(root / "init_time"), init_hours, chunks=(n_init,),
               attrs={"units": f"hours since {first_init}"})
    write_zarr(str(root / "step"), np.arange(n_step, dtype=np.int32),
               chunks=(n_step,), attrs={"units": "hours"})
    write_zarr(str(root / "x"), np.arange(grid) * 2000.0 + 100_000.0,
               chunks=(grid,))
    write_zarr(str(root / "y"), np.arange(grid) * 2000.0 + 500_000.0,
               chunks=(grid,))
    first = np.datetime64(first_init, "ns")
    init_times = first + (init_hours * 60).astype(np.int64) * np.timedelta64(60, "s")
    return data, init_times


def _expected_nwp_value(init_times, target, t0, variable, y_idx, x_idx):
    """The provenance encoding of the freshest-run rule: history targets use
    the freshest run <= target; targets after ceil(t0) freeze on the run
    chosen for ceil(t0) (nb28 cell 85 quirk)."""
    hour = np.timedelta64(1, "h")
    ceil_t0 = (
        t0 if t0 == t0.astype("datetime64[h]").astype("datetime64[ns]")
        else (t0.astype("datetime64[h]") + hour).astype("datetime64[ns]")
    )
    pick = min(np.datetime64(target, "ns"), ceil_t0)
    init_idx = int(np.searchsorted(init_times, pick, side="right")) - 1
    step_idx = int(
        (np.datetime64(target, "ns") - init_times[init_idx]) / hour
    )
    return init_idx * 10000 + step_idx * 100 + variable + y_idx / 4 + x_idx / 64


class TestNWPZarrExtraction:
    def test_axis_view_matches_moveaxis(self):
        from predict_pv_yield_tpu.data.sources import NWPAxisView

        rng = np.random.default_rng(0)
        src = rng.standard_normal((4, 3, 6, 7, 8)).astype(np.float32)
        view = NWPAxisView(src, ("init_time", "variable", "step", "y", "x"))
        canonical = np.moveaxis(src, 1, 2)  # channel from axis 1 to axis 2
        assert view.shape == canonical.shape
        np.testing.assert_array_equal(view[2, 4], canonical[2, 4])
        np.testing.assert_array_equal(
            view[2, 4, slice(None), slice(1, 5), slice(2, 6)],
            canonical[2, 4, :, 1:5, 2:6],
        )
        np.testing.assert_array_equal(view[1:3], canonical[1:3])
        # a fully scrambled order
        scrambled = ("x", "step", "y", "init_time", "channel")
        src2 = rng.standard_normal((8, 6, 7, 4, 3)).astype(np.float32)
        view2 = NWPAxisView(src2, scrambled)
        canonical2 = src2.transpose(3, 1, 4, 2, 0)
        assert view2.shape == canonical2.shape
        np.testing.assert_array_equal(view2[1, 2], canonical2[1, 2])
        np.testing.assert_array_equal(
            view2[slice(0, 2), 3, 1], canonical2[0:2, 3, 1]
        )
        with pytest.raises(ValueError, match="permutation"):
            NWPAxisView(src, ("init_time", "step", "y", "x", "bogus"))

    def test_open_zarr_nwp_freshest_run_crop_and_freeze(self, tmp_path):
        from predict_pv_yield_tpu.data.sources import open_zarr_nwp

        data, init_times = _write_nwp_store(tmp_path)
        source = open_zarr_nwp(str(tmp_path), image_size_pixels=8)
        assert source.step_duration == np.timedelta64(1, "h")

        start = np.datetime64("2020-06-01T06:20", "ns")
        t0 = start + np.timedelta64(30, "m")   # 06:50, ceil -> 07:00
        end = t0 + np.timedelta64(60, "m")     # 07:50
        centre = (100_000.0 + 12 * 2000.0, 500_000.0 + 16 * 2000.0)
        sample = source.get_sample(start, end, t0, centre=centre)

        # natural grid floor(06:20)..ceil(07:50) = 06:00,07:00,08:00 then the
        # nb28 static extension to ceil(90min/1h)+2 = 4 targets
        targets = sample["nwp_target_times"]
        assert len(targets) == 4
        assert str(targets[0]) == "2020-06-01T06:00:00.000000000"
        # crop geometry: centre pixel (x=12, y=16), half=4
        np.testing.assert_array_equal(
            sample["nwp_x"], np.arange(8, 16) * 2000.0 + 100_000.0
        )
        np.testing.assert_array_equal(
            sample["nwp_y"], np.arange(12, 20) * 2000.0 + 500_000.0
        )
        # every value carries its provenance: freshest run per history
        # target, the ceil(t0) choice frozen for future targets
        for k, target in enumerate(targets):
            for variable in range(3):
                expected = _expected_nwp_value(
                    init_times, target, t0, variable, y_idx=12, x_idx=8
                )
                np.testing.assert_allclose(
                    sample["nwp"][k, variable, 0, 0], expected, rtol=0
                )
        # off-archive centre raises BadData (window retry contract)
        with pytest.raises(BadData, match="outside the archive"):
            source.get_sample(
                start, end, t0, centre=(100_000.0 + 2000.0, 500_000.0)
            )

    def test_n_targets_trims_and_extends(self, tmp_path):
        from predict_pv_yield_tpu.data.sources import open_zarr_nwp

        _, init_times = _write_nwp_store(tmp_path)
        start = np.datetime64("2020-06-01T06:20", "ns")
        t0 = start + np.timedelta64(30, "m")
        end = t0 + np.timedelta64(60, "m")

        trimmed = open_zarr_nwp(str(tmp_path), image_size_pixels=8, n_targets=2)
        sample = trimmed.get_sample(start, end, t0)
        assert sample["nwp"].shape == (2, 3, 8, 8)
        assert len(sample["nwp_target_times"]) == 2

        extended = open_zarr_nwp(str(tmp_path), image_size_pixels=8, n_targets=7)
        sample = extended.get_sample(start, end, t0)
        assert sample["nwp"].shape == (7, 3, 8, 8)
        # the extension rides the frozen-future run with growing lead time
        hour = np.timedelta64(1, "h")
        assert sample["nwp_target_times"][-1] == (
            sample["nwp_target_times"][0] + 6 * hour
        )
        assert (
            sample["nwp_init_times"][-1] == sample["nwp_init_times"][2]
        )  # still the ceil(t0) run
        value = sample["nwp"][-1, 0, 0, 0]
        expected_init = int(np.searchsorted(
            init_times, np.datetime64("2020-06-01T07:00", "ns"), side="right"
        )) - 1
        step_idx = int(
            (sample["nwp_target_times"][-1] - init_times[expected_init]) / hour
        )
        # archive-centre crop without an explicit centre: median of the
        # even 24-wide grid ties between pixels 11/12, argmin takes 11,
        # half=4 -> the crop starts at pixel 7 on both axes
        np.testing.assert_allclose(
            value, expected_init * 10000 + step_idx * 100 + 7 / 4 + 7 / 64,
            rtol=0,
        )

    def test_prepare_dataset_with_nwp_zarr(self, tmp_path):
        """tools/prepare_dataset.py --nwp-zarr: shards carry real NWP grids
        (provenance-exact values at the model-contract hourly target count),
        alongside the real satellite windows."""
        from predict_pv_yield_tpu.data.shards import read_shard, shard_filename
        from predict_pv_yield_tpu.data.zarr_reader import write_zarr

        sat_store = tmp_path / "sat.zarr"
        n_frames, px = 160, 12  # 20% test tail must still fit 19-step windows
        times = _grid("2020-06-01T08:00", n_frames)
        frames = np.tile(
            np.arange(n_frames, dtype=np.int16)[:, None, None], (1, px, px)
        )
        write_zarr(str(sat_store / "data"), frames, chunks=(16, px, px))
        minutes = times.astype("datetime64[ns]").astype(np.int64) // (60 * 10**9)
        write_zarr(str(sat_store / "time"), minutes, chunks=(n_frames,),
                   attrs={"units": "minutes since 1970-01-01"})
        write_zarr(str(sat_store / "x"),
                   np.arange(px) * 2000.0 + 100_000.0, chunks=(px,))
        write_zarr(str(sat_store / "y"),
                   np.arange(px) * 2000.0 + 500_000.0, chunks=(px,))

        nwp_store = tmp_path / "nwp.zarr"
        nwp_store.mkdir()
        _, init_times = _write_nwp_store(nwp_store)

        out = tmp_path / "prepared"
        repo = os.path.join(os.path.dirname(__file__), "..")
        env = {
            k: v
            for k, v in {**os.environ, "JAX_PLATFORMS": "cpu"}.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }
        result = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "tools", "prepare_dataset.py"),
                "--out", str(out),
                "--satellite-zarr", str(sat_store),
                "--nwp-zarr", str(nwp_store),
                "--n-train", "1", "--n-test", "1", "--batch-size", "2",
                "--satellite-pixels", "8", "--nwp-pixels", "4",
                "--history-minutes", "30", "--forecast-minutes", "60",
            ],
            env=env, capture_output=True, text=True,
        )
        assert result.returncode == 0, result.stderr

        batch = read_shard(str(out / "train" / shard_filename(0, "raw")))
        nwp = np.asarray(batch.nwp.data)
        # model contract: T60 = ceil(30/60) + 60//60 + 1 = 3 hourly targets
        assert nwp.shape == (2, 3, 3, 4, 4)  # (B, C, T60, 4px, 4px)
        target_time = np.asarray(batch.nwp.target_time)
        t0s = np.asarray(batch.metadata.t0_datetime_utc)
        # archive-centre crop: median coord pixel 12 (even-grid argmin ties
        # resolve low: |11.5-12|=|12.5-12| -> idx 11... compute from coords)
        coords = np.arange(24) * 2000.0 + 100_000.0
        cx = int(np.abs(coords - float(np.median(coords))).argmin())
        coords_y = np.arange(24) * 2000.0 + 500_000.0
        cy = int(np.abs(coords_y - float(np.median(coords_y))).argmin())
        y0, x0 = cy - 2, cx - 2
        for b in range(2):
            t0 = t0s[b].astype("datetime64[ns]")
            for k in range(3):
                target = target_time[b, k].astype("datetime64[ns]")
                for variable in range(3):
                    expected = _expected_nwp_value(
                        init_times, target, t0, variable, y_idx=y0, x_idx=x0
                    )
                    np.testing.assert_allclose(
                        nwp[b, variable, k, 0, 0], expected, rtol=0,
                        err_msg=f"b={b} k={k} v={variable}",
                    )
        # hourly grid starts at floor(window start) and steps 1h
        dt = np.diff(target_time[0]).astype("timedelta64[ns]")
        assert (dt == np.timedelta64(1, "h")).all()
        # configuration channel list follows the 3-channel archive
        import yaml
        with open(out / "configuration.yaml") as fh:
            config = yaml.safe_load(fh)
        assert len(config["input_data"]["nwp"]["nwp_channels"]) == 3


class TestTopographicAndHRV:
    def test_topographic_crop_is_centre_exact(self, tmp_path):
        from predict_pv_yield_tpu.data.sources import (
            TopographicSource,
            open_zarr_topographic,
        )
        from predict_pv_yield_tpu.data.zarr_reader import write_zarr

        grid = 20
        y_idx, x_idx = np.ix_(np.arange(grid), np.arange(grid))
        elevation = (y_idx * 1000 + x_idx).astype(np.float32)
        x = np.arange(grid) * 2000.0 + 100_000.0
        y = np.arange(grid) * 2000.0 + 500_000.0

        source = TopographicSource(elevation, x, y, image_size_pixels=6)
        centre = (x[8], y[13])
        sample = source.get_sample(None, None, None, centre=centre)
        assert sample["topo_data"].shape == (6, 6)
        # half=3 -> rows 10..16, cols 5..11
        np.testing.assert_array_equal(
            sample["topo_data"], elevation[10:16, 5:11]
        )
        np.testing.assert_array_equal(sample["topo_x"], x[5:11])
        with pytest.raises(BadData, match="outside the archive"):
            source.get_sample(None, None, None, centre=(x[1], y[1]))
        # no size: the whole static grid
        whole = TopographicSource(elevation, x, y).get_sample(None, None, None)
        assert whole["topo_data"].shape == (grid, grid)

        # zarr round trip
        store = tmp_path / "topo.zarr"
        write_zarr(str(store / "data"), elevation, chunks=(10, 10))
        write_zarr(str(store / "x"), x, chunks=(grid,))
        write_zarr(str(store / "y"), y, chunks=(grid,))
        zsource = open_zarr_topographic(str(store), image_size_pixels=6)
        zsample = zsource.get_sample(None, None, None, centre=centre)
        np.testing.assert_array_equal(zsample["topo_data"], sample["topo_data"])

    def test_hrv_prefix_feeds_hrvsatellite_group(self):
        times = _grid("2020-06-01T10:00", 7)
        frames = np.tile(
            np.arange(7, dtype=np.float32)[:, None, None], (1, 6, 6)
        )
        hrv = SatelliteDataSource(frames, times, key_prefix="hrv")
        sat = SatelliteDataSource(frames * 10, times)
        s = {}
        for src in (sat, hrv):
            s.update(src.get_sample(times[0], times[6], times[3]))
        s.update(start_datetime=times[0], end_datetime=times[6],
                 t0_datetime=times[3])
        batch = collate_samples([s, s])
        assert batch.hrvsatellite.data.shape == (2, 1, 7, 6, 6)
        np.testing.assert_array_equal(
            batch.hrvsatellite.data[0, 0, :, 0, 0], np.arange(7, dtype=np.float32)
        )
        np.testing.assert_array_equal(
            batch.satellite.data[0, 0, :, 0, 0],
            np.arange(7, dtype=np.float32) * 10,
        )

    def test_prepare_dataset_all_real_modalities(self, tmp_path):
        """Every batch group from archives: satellite + HRV + NWP + topo +
        PV + sun, location-driven around a drawn PV system — value-exact
        for the location-dependent crops (topographic) and the PV series."""
        import pandas as pd

        from predict_pv_yield_tpu.data.shards import read_shard, shard_filename
        from predict_pv_yield_tpu.data.sources import _crop_bounds
        from predict_pv_yield_tpu.data.zarr_reader import write_zarr

        n_frames, px = 160, 24
        times = _grid("2020-06-01T08:00", n_frames)
        minutes = times.astype("datetime64[ns]").astype(np.int64) // (60 * 10**9)
        x = np.arange(px) * 2000.0 + 100_000.0
        y = np.arange(px) * 2000.0 + 500_000.0

        sat_store = tmp_path / "sat.zarr"
        frames = np.tile(
            np.arange(n_frames, dtype=np.int16)[:, None, None], (1, px, px)
        )
        write_zarr(str(sat_store / "data"), frames, chunks=(16, px, px))
        write_zarr(str(sat_store / "time"), minutes, chunks=(n_frames,),
                   attrs={"units": "minutes since 1970-01-01"})
        write_zarr(str(sat_store / "x"), x, chunks=(px,))
        write_zarr(str(sat_store / "y"), y, chunks=(px,))

        hrv_store = tmp_path / "hrv.zarr"
        hrv_frames = (frames * 3).astype(np.int16)
        write_zarr(str(hrv_store / "data"), hrv_frames, chunks=(16, px, px))
        write_zarr(str(hrv_store / "time"), minutes, chunks=(n_frames,),
                   attrs={"units": "minutes since 1970-01-01"})
        write_zarr(str(hrv_store / "x"), x, chunks=(px,))
        write_zarr(str(hrv_store / "y"), y, chunks=(px,))

        topo_store = tmp_path / "topo.zarr"
        y_idx, x_idx = np.ix_(np.arange(px), np.arange(px))
        elevation = (y_idx * 1000 + x_idx).astype(np.float32)
        write_zarr(str(topo_store / "data"), elevation, chunks=(px, px))
        write_zarr(str(topo_store / "x"), x, chunks=(px,))
        write_zarr(str(topo_store / "y"), y, chunks=(px,))

        nwp_store = tmp_path / "nwp.zarr"
        nwp_store.mkdir()
        _write_nwp_store(nwp_store, first_init="2020-06-01T00:00")

        # two PV systems well inside every crop margin; constant yields make
        # the series value-exact and identify the drawn system
        meta = pd.DataFrame(
            [
                dict(ss_id=11, kwp=4.0, x=x[10], y=y[10]),
                dict(ss_id=22, kwp=5.0, x=x[13], y=y[13]),
            ]
        )
        meta_csv = tmp_path / "meta.csv"
        meta.to_csv(meta_csv, index=False)
        power_rows = [
            dict(timestamp=str(t), ss_id=ss, instantaneous_power_w=w)
            for t in times
            for ss, w in ((11, 1000.0), (22, 2500.0))
        ]
        power_csv = tmp_path / "power.csv"
        pd.DataFrame(power_rows).to_csv(power_csv, index=False)

        out = tmp_path / "prepared"
        repo = os.path.join(os.path.dirname(__file__), "..")
        env = {
            k: v
            for k, v in {**os.environ, "JAX_PLATFORMS": "cpu"}.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }
        result = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "tools", "prepare_dataset.py"),
                "--out", str(out),
                "--satellite-zarr", str(sat_store),
                "--hrv-zarr", str(hrv_store), "--hrv-pixels", "8",
                "--topo-zarr", str(topo_store), "--topo-pixels", "6",
                "--nwp-zarr", str(nwp_store),
                "--pv-csv", str(power_csv), "--pv-metadata-csv", str(meta_csv),
                "--n-train", "1", "--n-test", "1", "--batch-size", "2",
                "--satellite-pixels", "8", "--nwp-pixels", "8",
                "--history-minutes", "30", "--forecast-minutes", "60",
            ],
            env=env, capture_output=True, text=True,
        )
        assert result.returncode == 0, result.stderr

        batch = read_shard(str(out / "train" / shard_filename(0, "raw")))
        system_xy = {11: (x[10], y[10]), 22: (x[13], y[13])}
        yield_by_id = {11: 1000.0 / 4000.0, 22: 2500.0 / 5000.0}
        topo = np.asarray(batch.topographic.topo_data)
        assert topo.shape == (2, 6, 6)
        hrv = np.asarray(batch.hrvsatellite.data)
        assert hrv.shape == (2, 1, 19, 8, 8)  # 90min/5+1 frames
        assert np.asarray(batch.nwp.data).shape == (2, 3, 3, 8, 8)
        for b in range(2):
            system_id = int(np.asarray(batch.pv.pv_system_id)[b, 0])
            assert system_id in system_xy
            # constant per-system yield series, value-exact
            np.testing.assert_allclose(
                np.asarray(batch.pv.pv_yield)[b, :, 0],
                yield_by_id[system_id], rtol=0, atol=1e-6,
            )
            # location-driven: the satellite crop is centred on that system
            centre_x, centre_y = system_xy[system_id]
            sat_x = np.asarray(batch.satellite.x)[b]
            assert sat_x[0] <= centre_x <= sat_x[-1]
            assert abs(float(np.median(sat_x)) - centre_x) <= 2000.0
            # topographic crop value-exact around the same location
            ysl, xsl = _crop_bounds(x, y, centre_x, centre_y, 6)
            np.testing.assert_array_equal(topo[b], elevation[ysl, xsl])
            # HRV is the HRV archive (3x the sat constants), window-aligned
            dt = np.asarray(batch.satellite.datetime_index)[b]
            frame_idx = np.searchsorted(
                times, dt.astype("datetime64[ns]")
            )
            np.testing.assert_array_equal(
                hrv[b, 0, :, 0, 0], (frame_idx * 3).astype(np.float32)
            )
        # written configuration carries the real geometry
        import yaml
        with open(out / "configuration.yaml") as fh:
            config = yaml.safe_load(fh)
        assert config["input_data"]["pv"]["n_pv_systems_per_example"] == 1
        assert (
            config["input_data"]["hrvsatellite"]["hrvsatellite_image_size_pixels"]
            == 8
        )
        assert (
            config["input_data"]["topographic"]["topographic_image_size_pixels"]
            == 6
        )


class TestPrepareWorkers:
    def test_prepare_dataset_parallel_workers_bit_identical(self, tmp_path):
        """tools/prepare_dataset.py --workers: each batch derives its
        sampling AND filler rngs from (seed, split, index), so the written
        dataset is bit-identical at any worker count — conversion
        parallelises across cores (VERDICT r4 #2) without changing output."""
        from predict_pv_yield_tpu.data.shards import shard_filename
        from predict_pv_yield_tpu.data.zarr_reader import write_zarr

        store = tmp_path / "sat.zarr"
        n_frames, px = 80, 12
        times = _grid("2020-06-01T08:00", n_frames)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 900, size=(n_frames, px, px), dtype=np.int16)
        write_zarr(str(store / "data"), frames, chunks=(16, px, px))
        minutes = (
            times.astype("datetime64[ns]").astype(np.int64) // (60 * 10**9)
        )
        write_zarr(str(store / "time"), minutes, chunks=(n_frames,),
                   attrs={"units": "minutes since 1970-01-01"})
        write_zarr(str(store / "x"),
                   np.arange(px) * 2000.0 + 100_000.0, chunks=(px,))
        write_zarr(str(store / "y"),
                   np.arange(px) * 2000.0 + 500_000.0, chunks=(px,))

        repo = os.path.join(os.path.dirname(__file__), "..")
        env = {
            k: v
            for k, v in {**os.environ, "JAX_PLATFORMS": "cpu"}.items()
            if k != "PALLAS_AXON_POOL_IPS"
        }

        def build(workers):
            out = tmp_path / f"prepared_w{workers}"
            result = subprocess.run(
                [
                    sys.executable,
                    os.path.join(repo, "tools", "prepare_dataset.py"),
                    "--out", str(out),
                    "--satellite-zarr", str(store),
                    "--n-train", "4", "--n-test", "2", "--batch-size", "2",
                    "--satellite-pixels", "8", "--nwp-pixels", "2",
                    "--history-minutes", "30", "--forecast-minutes", "30",
                    "--workers", str(workers),
                ],
                env=env, capture_output=True, text=True,
            )
            assert result.returncode == 0, result.stderr
            return out

        serial, threaded = build(1), build(4)
        for split, count in (("train", 4), ("test", 2)):
            for i in range(count):
                name = shard_filename(i, "raw")
                with open(serial / split / name, "rb") as fh:
                    a = fh.read()
                with open(threaded / split / name, "rb") as fh:
                    b = fh.read()
                assert a == b, f"{split}/{name} differs between worker counts"
