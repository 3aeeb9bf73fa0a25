"""Validation-results CSV contract
(reference ``tests/models/baseline/test_baseline_model_gsp.py:104-110``)."""

import numpy as np
import pandas as pd

from predict_pv_yield_tpu.validation import (
    make_validation_results,
    save_validation_results_to_logger,
)


def test_make_validation_results_contract():
    batch_size, forecast_len = 2, 4
    t0 = np.full(batch_size, 1_622_505_600_000_000_000, dtype=np.int64)
    df = make_validation_results(
        truths_mw=np.ones((batch_size, forecast_len)),
        predictions_mw=np.full((batch_size, forecast_len), 2.0),
        capacity_mwp=np.full((batch_size, forecast_len), 10.0),
        gsp_ids=np.array([7, 8]),
        batch_idx=3,
        t0_datetimes_utc=t0,
    )
    assert len(df) == batch_size * forecast_len
    for col in (
        "t0_datetime_utc",
        "target_datetime_utc",
        "gsp_id",
        "actual_gsp_pv_outturn_mw",
        "forecast_gsp_pv_outturn_mw",
    ):
        assert col in df.columns
    # target datetimes advance on the 30-minute GSP grid
    deltas = df["target_datetime_utc"] - df["t0_datetime_utc"]
    assert deltas.iloc[0] == pd.Timedelta(minutes=30)
    assert deltas.iloc[forecast_len - 1] == pd.Timedelta(minutes=30 * forecast_len)
    assert (df["gsp_id"].values[:forecast_len] == 7).all()


def test_save_validation_results(tmp_path):
    df = pd.DataFrame({"a": [1, 2]})
    stem = str(tmp_path / "results_epoch")
    path = save_validation_results_to_logger([df, df], stem, current_epoch=5, logger=None)
    assert path.endswith("results_epoch_5.csv")
    out = pd.read_csv(path)
    assert len(out) == 4
