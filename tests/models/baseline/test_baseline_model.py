"""Baseline (last_value) model tests — mirrors reference
``tests/models/baseline/test_baseline_model.py``."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.baseline import Model


def test_init():
    _ = Model()


def test_model_forward(configuration):
    model = Model(
        forecast_minutes=configuration.input_data.default_forecast_minutes,
        history_minutes=configuration.input_data.default_history_minutes,
    )
    batch = FakeDataset(configuration=configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert len(y.shape) == 2
    assert y.shape[0] == configuration.process.batch_size
    assert y.shape[1] == configuration.input_data.default_forecast_minutes // 5


def test_persistence_semantics(configuration):
    model = Model(forecast_minutes=60, history_minutes=30, output_variable="gsp_yield")
    batch = FakeDataset(configuration=configuration)[0].numeric()
    y = model.apply({}, batch)
    # every forecast step repeats the last pre-forecast value of system 0
    last = batch.gsp.gsp_yield[:, -model.forecast_len - 1, 0]
    assert (y == last[:, None]).all()
