"""End-to-end coverage for ``tools/predict.py`` — the productionised
inference path (reference inference story: ``pl_load`` + ``load_state_dict``,
``experiments/2021-09/2021-09-03/conv3d.py:10-23``): restore an orbax
checkpoint, run the jitted forward over batches, write forecasts as CSV."""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d import Model as Conv3d
from predict_pv_yield_tpu.training.callbacks import ModelCheckpoint
from predict_pv_yield_tpu.training.engine import Trainer
from predict_pv_yield_tpu.utils import load_config

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_predict_module():
    spec = importlib.util.spec_from_file_location(
        "predict_tool", os.path.join(REPO, "tools", "predict.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _run_predict(monkeypatch, out_path, checkpoint=None, n_batches=1):
    argv = [
        "predict.py",
        "--model", "conv3d",
        "--model-config", os.path.join(REPO, "tests/configs/model/conv3d_tiny.yaml"),
        "--n-batches", str(n_batches),
        "--out", str(out_path),
    ]
    if checkpoint:
        argv += ["--checkpoint", str(checkpoint)]
    monkeypatch.setattr(sys, "argv", argv)
    _load_predict_module().main()
    return pd.read_csv(out_path)


def test_predict_tool_writes_forecasts_and_loads_checkpoints(
    sharded_configuration, tmp_path, monkeypatch, tmp_cwd
):
    # train one tiny epoch to produce a real orbax checkpoint
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=2)
    ckpt = ModelCheckpoint(dirpath=str(tmp_path / "ckpt"))
    trainer = Trainer(max_epochs=1, profiler=None, callbacks=[ckpt])
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert os.path.isdir(ckpt.best_model_path)

    fresh = _run_predict(monkeypatch, tmp_path / "fresh.csv")
    restored = _run_predict(
        monkeypatch, tmp_path / "restored.csv", checkpoint=ckpt.best_model_path
    )

    # CSV contract: one row per (batch, example, horizon); conv3d at
    # pv_yield granularity = batch 32, forecast_len 60/5 = 12
    assert list(fresh.columns) == [
        "batch_index", "example_index", "forecast_horizon", "forecast",
    ]
    assert len(fresh) == 32 * 12
    assert np.isfinite(fresh["forecast"]).all()
    assert fresh["forecast_horizon"].min() == 1
    assert fresh["forecast_horizon"].max() == 12

    # the checkpoint actually loaded: identical fake batches (seeded per
    # index), different params -> different forecasts
    assert len(restored) == len(fresh)
    assert not np.allclose(
        restored["forecast"].to_numpy(), fresh["forecast"].to_numpy()
    )


# the sharded_configuration fixture lives in test_engine; re-declare here so
# this file stands alone
@pytest.fixture()
def sharded_configuration():
    from predict_pv_yield_tpu.config.dataset import Configuration

    configuration = Configuration()
    configuration.process.batch_size = 8
    configuration.input_data.default_history_minutes = 60
    configuration.input_data.default_forecast_minutes = 60
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.nwp.nwp_image_size_pixels = 2
    configuration.input_data.satellite.satellite_image_size_pixels = 16
    return configuration
