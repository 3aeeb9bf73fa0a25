"""Full-stack integration test — mirrors reference ``tests/test_training.py``:
compose the real config tree with the example_simple experiment on fake data
and run the whole pipeline (config → instantiate → validate → CSVs)."""

import os

from predict_pv_yield_tpu.config.composer import compose
from predict_pv_yield_tpu.training.pipeline import train


def test_train(tmp_cwd):
    config = compose(
        config_name="config",
        overrides=[
            "logger=csv",
            "experiment=example_simple",
            "datamodule.fake_data=true",
            "datamodule.data_path=tests/configs/dataset",
            "trainer.fast_dev_run=true",
        ],
        config_dir=os.path.join(os.path.dirname(__file__), "..", "configs"),
    )
    # example_simple composes the baseline model + validate_only
    assert config["model"]["_target_"].endswith("baseline.Model")
    assert "validate_only" in config
    assert config["datamodule"]["fake_data"] is True
    assert config["seed"] == 518

    # data_path is relative to the repo; tmp_cwd changed directories
    config["datamodule"]["data_path"] = os.path.join(
        os.path.dirname(__file__), "configs", "dataset"
    )
    train(config=config)


def test_train_fit_conv3d(tmp_cwd):
    config = compose(
        config_name="config",
        overrides=[
            "logger=csv",
            "model=conv3d",
            "datamodule.fake_data=true",
            "datamodule.n_train_data=2",
            "datamodule.n_val_data=2",
            "trainer.fast_dev_run=true",
            "model.image_size_pixels=16",
            "model.number_sat_channels=1",
            "model.history_minutes=60",
            "model.forecast_minutes=30",
            "model.number_of_conv3d_layers=2",
            "model.include_nwp=false",
            "+optimized_metric=MSE/Validation_epoch",
        ],
        config_dir=os.path.join(os.path.dirname(__file__), "..", "configs"),
    )
    config["datamodule"]["data_path"] = os.path.join(
        os.path.dirname(__file__), "configs", "dataset_small"
    )
    result = train(config=config)
    assert result is not None
