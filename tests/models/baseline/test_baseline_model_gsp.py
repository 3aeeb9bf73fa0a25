"""GSP baseline validation tests — mirrors reference
``tests/models/baseline/test_baseline_model_gsp.py`` including the
validation-results CSV contract (``:81-111``)."""

import pandas as pd

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.baseline import Model
from predict_pv_yield_tpu.training.engine import Trainer


def test_init():
    _ = Model(output_variable="gsp_yield")


def test_model_forward(configuration):
    model = Model(
        forecast_minutes=configuration.input_data.default_forecast_minutes,
        history_minutes=configuration.input_data.default_history_minutes,
        output_variable="gsp_yield",
    )
    ds = FakeDataset(configuration=configuration)
    batch = ds[0].numeric()
    y = model.apply({}, batch)
    assert len(y.shape) == 2
    assert y.shape[0] == configuration.process.batch_size
    assert y.shape[1] == configuration.input_data.default_forecast_minutes // 30


def test_trainer_test(configuration):
    model = Model(
        forecast_minutes=configuration.input_data.default_forecast_minutes,
        history_minutes=configuration.input_data.default_history_minutes,
        output_variable="gsp_yield",
    )
    ds = FakeDataset(configuration=configuration, length=2)
    trainer = Trainer(max_epochs=1, profiler=None)
    metrics = trainer.test(model, dataloaders=ds)
    assert "NMAE/Test_epoch" in metrics


def test_trainer_validation_csv_contract(configuration, tmp_cwd):
    model = Model(
        forecast_minutes=configuration.input_data.default_forecast_minutes,
        history_minutes=configuration.input_data.default_history_minutes,
        output_variable="gsp_yield",
        results_file_name=str(tmp_cwd / "temp"),
    )
    ds = FakeDataset(configuration=configuration, length=3)
    trainer = Trainer(max_epochs=1, profiler=None)
    trainer.validate(model, dataloaders=ds)

    results_df = pd.read_csv(f"{model.results_file_name}_0.csv")
    assert len(results_df) == len(ds) * configuration.process.batch_size * model.forecast_len_30
    for col in (
        "t0_datetime_utc",
        "target_datetime_utc",
        "gsp_id",
        "actual_gsp_pv_outturn_mw",
        "forecast_gsp_pv_outturn_mw",
    ):
        assert col in results_df.keys()
