"""Super-batch pipeline + flow-forecaster tests (notebook 13 workload)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from predict_pv_yield_tpu.data.flow_dataset import (
    FlowInMemDataset,
    ImageHasNansError,
    SatelliteFlowLoader,
    compute_valid_start_times,
    convert_10bpp_to_uint8,
    normalise_forecast_horizon,
    sample_squares,
    super_batch_to_example,
)
from predict_pv_yield_tpu.models.flow_forecaster import (
    FORECAST_HORIZON,
    HISTORICAL_SAT_IMAGES,
    OPTICAL_FLOW_PREDICTIONS,
    TARGET_SAT_IMAGE,
    FlowForecaster,
)


def _fake_archive(n_days=3, frames_per_day=24 * 12, size=160, seed=0):
    """int16 archive of smooth drifting clouds, 5-minute cadence.

    Temporally COHERENT: one cloud field advected 1 px/frame. An earlier
    fixture drew a fresh random field per frame; Farnebäck flow between
    unrelated images is garbage, and warping by garbage flows made ~50% of
    prediction pixels NaN — the crop sampler only passed by retry luck.
    """
    rng = np.random.default_rng(seed)
    n = n_days * frames_per_day
    datetimes = np.datetime64("2019-05-28T00:00") + np.arange(n) * np.timedelta64(5, "m")
    coarse = rng.integers(0, 900, size=(size // 16, size // 16)).astype(np.float32)
    img = np.asarray(
        jax.image.resize(jnp.asarray(coarse), (size, size), "bilinear")
    ).astype(np.int16)
    frames = np.empty((n, size, size), dtype=np.int16)
    for i in range(n):
        frames[i] = np.roll(img, shift=i, axis=1)
    return frames, datetimes


@pytest.fixture(scope="module")
def archive():
    return _fake_archive()


def test_valid_start_times(archive):
    frames, datetimes = archive
    valid = compute_valid_start_times(
        datetimes,
        num_forecast_timesteps=48,
        testing_date_range=(np.datetime64("2019-05-29"), np.datetime64("2019-05-30")),
    )
    assert len(valid["training"]) > 0
    assert len(valid["testing"]) > 0
    # daytime window: hours 10..11 (16 - 4 forecast hours)
    hours = valid["training"].astype("datetime64[h]").astype(np.int64) % 24
    assert hours.min() >= 10
    assert hours.max() <= 11
    # no overlap between splits
    assert not set(valid["training"]) & set(valid["testing"])


def test_convert_10bpp():
    arr = np.array([[-1, 0, 511, 1023]], dtype=np.float32)
    arr[0, 0] = np.nan
    out = convert_10bpp_to_uint8(arr)
    assert out.dtype == np.uint8
    assert list(out[0]) == [0, 0, 128, 255]


def test_horizon_normalisation():
    # mean horizon normalises to ~0
    mid = normalise_forecast_horizon(12 * 300)
    assert abs(mid) < 0.1


def test_super_batch_and_example(archive):
    # 12 forecast steps (not nb13's production 48): the triangular
    # prediction matrix is O(n^2) warps and the logic is step-count
    # independent; production shapes run in tools/flow_bench.py
    frames, datetimes = archive
    loader = SatelliteFlowLoader(
        data=frames,
        datetimes=datetimes,
        num_forecast_timesteps=12,
        testing_date_range=(np.datetime64("2019-05-29"), np.datetime64("2019-05-30")),
    )
    super_batch = loader.load_super_batch("training")
    assert super_batch.sat_images.shape == (13, 160, 160)
    assert super_batch.flows.shape == (12, 160, 160, 2)
    assert super_batch.predictions.shape == (12, 12, 160, 160)

    rng = np.random.default_rng(0)
    example = super_batch_to_example(super_batch, rng=rng)
    assert example[TARGET_SAT_IMAGE].shape == (64, 64)
    assert example[HISTORICAL_SAT_IMAGES].shape == (4, 128, 128)
    assert example[OPTICAL_FLOW_PREDICTIONS].shape == (128, 128)
    assert not np.isnan(example[HISTORICAL_SAT_IMAGES]).any()
    assert not np.isnan(example[OPTICAL_FLOW_PREDICTIONS]).any()


def test_sample_squares_rejects_nans():
    rng = np.random.default_rng(0)
    example = {
        OPTICAL_FLOW_PREDICTIONS: np.full((130, 130), np.nan, np.float32),
        HISTORICAL_SAT_IMAGES: np.zeros((4, 130, 130), np.float32),
        TARGET_SAT_IMAGE: np.zeros((130, 130), np.float32),
        FORECAST_HORIZON: np.float32(0),
    }
    with pytest.raises(ImageHasNansError):
        sample_squares(example, rng)


def test_flow_forecaster_trains(archive):
    frames, datetimes = archive
    loader = SatelliteFlowLoader(
        data=frames,
        datetimes=datetimes,
        num_forecast_timesteps=12,
        testing_date_range=(np.datetime64("2019-05-29"), np.datetime64("2019-05-30")),
    )
    dataset = FlowInMemDataset(
        loader,
        n_super_batches=1,
        n_examples_per_epoch=8,
        batch_size=4,
        background_refresh=False,
    )
    batch = next(iter(dataset))
    assert batch[HISTORICAL_SAT_IMAGES].shape == (4, 4, 128, 128)

    model = FlowForecaster(channels=8)
    variables = model.init(jax.random.key(0), batch)
    y_hat = model.apply(variables, batch)
    assert y_hat.shape == (4, 64, 64)

    # one training step DECREASES the MSE on this deterministic batch —
    # gates the grad sign and the optax wiring, not just finiteness
    tx = optax.adam(1e-4)  # notebook 13 cell 39 configure_optimizers
    opt_state = tx.init(variables)

    def loss_fn(params):
        prediction = model.apply(params, batch)
        return jnp.mean((prediction - batch[TARGET_SAT_IMAGE]) ** 2)

    loss0, grads = jax.value_and_grad(loss_fn)(variables)
    updates, opt_state = tx.update(grads, opt_state, variables)
    variables = optax.apply_updates(variables, updates)
    loss1 = loss_fn(variables)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    assert float(loss1) < float(loss0), (float(loss0), float(loss1))


def test_window_rejects_time_gaps():
    """Positional windows spanning archive gaps must be rejected (the
    reference's contiguity check)."""
    frames, datetimes = _fake_archive(n_days=1)
    # remove 12:05-12:35: valid daytime starts run 10:00-11:55 (window end
    # must stay before 16:00), so EVERY candidate 49-frame window covers the
    # gap — the rejection path is exercised deterministically
    keep = np.ones(len(frames), bool)
    keep[145:151] = False
    loader = SatelliteFlowLoader(
        data=frames[keep],
        datetimes=datetimes[keep],
        num_forecast_timesteps=48,
        testing_date_range=(np.datetime64("2020-01-01"), np.datetime64("2020-01-02")),
        rng_seed=0,
    )
    starts = loader.valid_start_times["training"]
    window = loader.num_forecast_timesteps + 1
    idx = [loader._time_index[s] for s in starts]
    spans_gap = [
        not np.all(
            np.diff(np.asarray(loader.datetimes[i : i + window], dtype="datetime64[ns]"))
            == np.timedelta64(5, "m")
        )
        for i in idx
    ]
    assert len(starts) > 0 and all(spans_gap), (
        f"fixture drift: {sum(spans_gap)}/{len(spans_gap)} starts span the gap"
    )
    with pytest.raises(ValueError, match="Failed to find valid data"):
        loader.load_satellite_window("training")


def test_sample_squares_exact_size_ok():
    rng = np.random.default_rng(0)
    example = {
        OPTICAL_FLOW_PREDICTIONS: np.zeros((128, 128), np.float32),
        HISTORICAL_SAT_IMAGES: np.zeros((4, 128, 128), np.float32),
        TARGET_SAT_IMAGE: np.zeros((128, 128), np.float32),
        FORECAST_HORIZON: np.float32(0),
    }
    out = sample_squares(example, rng)
    assert out[OPTICAL_FLOW_PREDICTIONS].shape == (128, 128)
    assert out[TARGET_SAT_IMAGE].shape == (64, 64)


def test_interior_nans_propagate_to_predictions():
    """Missing-data pixels (int16 == -1) must surface as NaN in the flow
    predictions so crop rejection sees them."""
    frames, datetimes = _fake_archive(n_days=1)
    frames = frames.copy()
    frames[:, 80:90, 80:90] = -1  # persistent interior outage
    loader = SatelliteFlowLoader(
        data=frames,
        datetimes=datetimes,
        num_forecast_timesteps=12,
        testing_date_range=(np.datetime64("2020-01-01"), np.datetime64("2020-01-02")),
    )
    super_batch = loader.load_super_batch("training")
    assert np.isnan(super_batch.sat_images[:, 85, 85]).all()
    assert np.isnan(super_batch.predictions[0, 0, 85, 85])


def test_lazy_predictions_match_dense(archive):
    frames, datetimes = archive
    kwargs = dict(
        data=frames,
        datetimes=datetimes,
        num_forecast_timesteps=12,
        testing_date_range=(np.datetime64("2019-05-29"), np.datetime64("2019-05-30")),
        rng_seed=7,
    )
    dense = SatelliteFlowLoader(**kwargs).load_super_batch("training")
    lazy = SatelliteFlowLoader(**kwargs, precompute_predictions=False).load_super_batch(
        "training"
    )
    assert lazy.predictions is None
    np.testing.assert_array_equal(dense.sat_images, lazy.sat_images)
    for t0_idx, step in ((0, 1), (3, 5), (10, 2)):
        a = dense.prediction(t0_idx, step)
        b = lazy.prediction(t0_idx, step)
        np.testing.assert_allclose(
            np.nan_to_num(a), np.nan_to_num(b), atol=1e-4
        )
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))

    rng = np.random.default_rng(0)
    example = super_batch_to_example(lazy, rng=rng)
    assert example[OPTICAL_FLOW_PREDICTIONS].shape == (128, 128)


def test_loader_accepts_zarr_array(tmp_path):
    """tools/train_flow_forecaster passes a ZarrArray straight in — the
    loader's len()/slice usage must work on the duck array, not only numpy
    (a confirmed crash in round-3 review)."""
    from predict_pv_yield_tpu.data.flow_dataset import SatelliteFlowLoader
    from predict_pv_yield_tpu.data.zarr_reader import open_zarr, write_zarr

    n = 20
    times = np.datetime64("2019-07-01T10:00", "ns") + np.arange(n) * np.timedelta64(5, "m")
    frames = np.arange(n * 16, dtype=np.int16).reshape(n, 4, 4)
    write_zarr(str(tmp_path / "hrv"), frames, chunks=(4, 4, 4))
    loader = SatelliteFlowLoader(
        data=open_zarr(str(tmp_path / "hrv")),
        datetimes=times,
        num_forecast_timesteps=4,
    )
    window, window_times = loader.load_satellite_window("training")
    assert window.shape == (5, 4, 4)
    assert len(window_times) == 5
