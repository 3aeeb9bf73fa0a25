"""Geo conversions (OSGB36 National Grid) and the example plot's map layer
(native equivalent of the reference's tilemapbase-based plot_example,
reference base_model.py:174-192)."""

import numpy as np

from predict_pv_yield_tpu.geo import (
    gb_coastline_osgb,
    latlon_from_osgb,
    osgb_from_latlon,
)


def test_osgb_known_landmarks():
    # Charing Cross, London: TQ 3030 8040 → (530300, 180400), ±50 m
    easting, northing = osgb_from_latlon(51.5074, -0.1278)
    assert abs(float(easting) - 530_030) < 100
    assert abs(float(northing) - 180_380) < 100
    # Edinburgh Castle: NT 2520 7350 → (325200, 673500), ±100 m
    easting, northing = osgb_from_latlon(55.9486, -3.1999)
    assert abs(float(easting) - 325_200) < 150
    assert abs(float(northing) - 673_500) < 150


def test_osgb_roundtrip_vectorised():
    lats = np.linspace(50.2, 58.4, 13)
    lons = np.linspace(-5.5, 1.5, 13)
    easting, northing = osgb_from_latlon(lats, lons)
    lat2, lon2 = latlon_from_osgb(easting, northing)
    np.testing.assert_allclose(lat2, lats, atol=1e-7)
    np.testing.assert_allclose(lon2, lons, atol=1e-7)


def test_coastline_within_national_grid():
    easting, northing = gb_coastline_osgb()
    assert easting.shape == northing.shape
    assert len(easting) > 80
    # all of Great Britain lies within the grid's positive quadrant
    assert easting.min() > 0 and easting.max() < 800_000
    assert northing.min() > 0 and northing.max() < 1_250_000


def test_plot_example_geo_layer(configuration, tmp_path):
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.visualization import plot_example

    batch = fake_batch(configuration, np.random.default_rng(0))
    # give the satellite crop a real OSGB extent (64 km square near London)
    width = batch.satellite.data.shape[-1]
    height = batch.satellite.data.shape[-2]
    batch_size = batch.satellite.data.shape[0]
    xs = np.linspace(500_000, 564_000, width, dtype=np.float32)
    ys = np.linspace(212_000, 148_000, height, dtype=np.float32)
    batch = batch.replace(
        satellite=batch.satellite.replace(
            x=np.tile(xs, (batch_size, 1)), y=np.tile(ys, (batch_size, 1))
        )
    )
    forecast = np.zeros((batch_size, 4), np.float32)
    fig = plot_example(
        batch, forecast, history_minutes=30, forecast_minutes=120,
        output_variable="gsp_yield",
    )
    out = tmp_path / "example.html"
    fig.write_html(str(out))
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "data:image/png;base64," in html
