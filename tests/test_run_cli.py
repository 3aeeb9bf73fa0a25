"""CLI entrypoint semantics that only ``run.py`` owns: the hydra-style
run-dir chdir, launch-dir pinning of relative data paths, and the multirun
sweep wiring (reference ``run.py:16-43`` + the Optuna sweeper call stack,
SURVEY §3.5). ``tests/test_training.py`` covers everything below
``train()``; this covers the layer above it."""

import os
import shutil

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_run_cli_multirun_sweep_with_relative_data_path(tmp_path, monkeypatch, capsys):
    """``python run.py -m hparams_search=...`` end-to-end from a scratch
    launch directory with a RELATIVE datamodule.data_path — every trial
    re-composes after the chdir into the run dir, so this exercises the
    launch-dir pinning fix as well as the sweep loop."""
    import run as run_module

    # a relative dataset dir in the launch directory
    shutil.copytree(
        os.path.join(REPO, "tests", "configs", "dataset_small"),
        tmp_path / "ds",
    )
    monkeypatch.chdir(tmp_path)

    run_module.main([
        "-m",
        "hparams_search=conv3d_optuna",
        "experiment=conv3d_sat_nwp",
        "logger=csv",
        "datamodule.fake_data=true",
        "datamodule.data_path=ds",
        "datamodule.n_train_data=1",
        "datamodule.n_val_data=1",
        "trainer.max_epochs=1",
        "model.image_size_pixels=16",
        "model.number_sat_channels=1",
        "model.history_minutes=60",
        "model.forecast_minutes=30",
        "model.number_of_conv3d_layers=2",
        "model.include_nwp=false",
        "sweep.n_trials=2",
    ])

    out = capsys.readouterr().out
    assert "sweep best value:" in out
    # the hydra-style run directory was created under the launch dir
    assert (tmp_path / "logs").exists()


def test_run_cli_rejects_unknown_experiment(tmp_path, monkeypatch):
    import run as run_module

    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError):
        run_module.main(["experiment=does_not_exist"])
