"""First-party solar position (`sun.py`) vs astronomical ground truths."""

import numpy as np
import pytest

from predict_pv_yield_tpu.sun import solar_position, sun_angles_osgb

LONDON = (51.5074, -0.1278)


def _minutes(day: str, start_h: float, end_h: float, step_min: float = 1.0):
    t0 = np.datetime64(day, "ns")
    lo = int(start_h * 60)
    hi = int(end_h * 60)
    return t0 + (np.arange(lo, hi) * np.timedelta64(60, "s")).astype(
        "timedelta64[ns]"
    )


class TestSolarPosition:
    def test_equator_equinox_noon_near_zenith(self):
        times = _minutes("2021-03-20", 11.5, 12.5)
        el, az = solar_position(times, 0.0, 0.0)
        assert el.max() > 89.0  # sun passes almost overhead

    def test_london_summer_solstice_noon(self):
        times = _minutes("2021-06-21", 11.0, 13.0)
        el, az = solar_position(times, *LONDON)
        i = int(el.argmax())
        # 90 − 51.5074 + 23.44 = 61.93°, azimuth due south at transit
        assert el[i] == pytest.approx(61.93, abs=0.3)
        assert az[i] == pytest.approx(180.0, abs=2.0)

    def test_london_winter_solstice_noon(self):
        times = _minutes("2021-12-21", 11.0, 13.0)
        el, _ = solar_position(times, *LONDON)
        # 90 − 51.5074 − 23.44 = 15.05°
        assert el.max() == pytest.approx(15.05, abs=0.3)

    def test_night_is_below_horizon_and_north(self):
        el, az = solar_position(
            np.array(["2021-06-21T00:00"], dtype="datetime64[ns]"), *LONDON
        )
        assert el[0] < -10.0
        assert min(az[0], 360.0 - az[0]) < 15.0  # roughly due north

    def test_equinox_sunrise_azimuth_due_east(self):
        times = _minutes("2021-03-20", 5.0, 8.0)
        el, az = solar_position(times, *LONDON)
        i = int(np.argmin(np.abs(el)))  # the horizon crossing
        assert abs(el[i]) < 0.3
        assert az[i] == pytest.approx(90.0, abs=2.5)

    def test_morning_east_afternoon_west(self):
        el_am, az_am = solar_position(
            np.array(["2021-06-21T08:00"], dtype="datetime64[ns]"), *LONDON
        )
        el_pm, az_pm = solar_position(
            np.array(["2021-06-21T16:00"], dtype="datetime64[ns]"), *LONDON
        )
        assert az_am[0] < 180.0 < az_pm[0]
        assert el_am[0] > 0 and el_pm[0] > 0

    def test_refraction_lifts_horizon_sun_only(self):
        times = _minutes("2021-03-20", 5.0, 8.0)
        el, _ = solar_position(times, *LONDON)
        el_app, _ = solar_position(times, *LONDON, refraction=True)
        i = int(np.argmin(np.abs(el)))
        # ~0.48° of refraction at the horizon (NOAA), ≪0.05° when high
        assert el_app[i] - el[i] == pytest.approx(0.48, abs=0.05)
        noon_el, _ = solar_position(
            np.array(["2021-06-21T12:00"], dtype="datetime64[ns]"), *LONDON
        )
        noon_app, _ = solar_position(
            np.array(["2021-06-21T12:00"], dtype="datetime64[ns]"),
            *LONDON,
            refraction=True,
        )
        assert noon_app[0] - noon_el[0] < 0.02

    def test_southern_hemisphere_noon_faces_north(self):
        times = _minutes("2021-06-21", 11.5, 12.5)  # Quito is near lon −78
        el, az = solar_position(times + np.timedelta64(5, "h"), -33.87, 151.21)
        # Sydney, winter solstice: transit azimuth due north
        el_syd, az_syd = solar_position(
            _minutes("2021-06-21", 1.0, 3.0), -33.87, 151.21
        )
        i = int(el_syd.argmax())
        assert min(az_syd[i], 360 - az_syd[i]) < 2.0
        # 90 − 33.87 − 23.44 = 32.69°
        assert el_syd[i] == pytest.approx(32.69, abs=0.3)

    def test_broadcast_shapes(self):
        times = _minutes("2021-06-21", 10.0, 10.5)
        el, az = solar_position(times, *LONDON)
        assert el.shape == az.shape == times.shape


class TestSunAnglesOsgb:
    def test_matches_latlon_at_central_london(self):
        times = _minutes("2021-06-21", 11.0, 13.0)
        # OSGB easting/northing of ~(51.5074 N, 0.1278 W)
        from predict_pv_yield_tpu.geo import osgb_from_latlon

        e, n = osgb_from_latlon(np.array([LONDON[0]]), np.array([LONDON[1]]))
        el_osgb, az_osgb = sun_angles_osgb(times, float(e[0]), float(n[0]))
        el, az = solar_position(times, *LONDON)
        np.testing.assert_allclose(el_osgb, el, atol=0.01)
        np.testing.assert_allclose(az_osgb, az, atol=0.05)
