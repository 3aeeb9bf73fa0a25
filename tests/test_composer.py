"""Config composition semantics (the hydra-compatible slice)."""

import os

import pytest

from predict_pv_yield_tpu.config.composer import compose, deep_merge
from predict_pv_yield_tpu.config.instantiate import instantiate, locate

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _compose(overrides=None):
    return compose("config", overrides, config_dir=CONFIG_DIR)


def test_root_defaults():
    cfg = _compose()
    assert cfg["trainer"]["_target_"].endswith("Trainer")
    assert cfg["model"]["_target_"].endswith("conv3d.Model")
    assert "model_checkpoint" in cfg["callbacks"]
    assert cfg["test_after_training"] is True


def test_group_selection_override():
    cfg = _compose(["model=baseline", "logger=jsonl"])
    assert cfg["model"]["_target_"].endswith("baseline.Model")
    assert "jsonl" in cfg["logger"]


def test_experiment_overlay():
    cfg = _compose(["experiment=example_simple"])
    # overlay re-selects the model group and merges root keys
    assert cfg["model"]["_target_"].endswith("baseline.Model")
    assert cfg["seed"] == 518
    assert cfg["trainer"]["max_epochs"] == 2
    assert cfg["datamodule"]["fake_data"] == 1
    assert cfg["validate_only"] == "1"


def test_cli_group_selection_beats_experiment_override():
    """hydra priority: an explicit CLI group selection composes after (and
    wins over) an experiment file's `override /group` defaults entry."""
    cfg = _compose(["experiment=conv3d", "logger=jsonl"])
    # the conv3d experiment pins its own logger via `override /logger`, but
    # the command line asked for jsonl — the CLI must win
    assert "jsonl" in cfg["logger"], list(cfg["logger"])
    # groups the CLI did not touch still follow the experiment
    assert cfg["model"]["_target_"].endswith("conv3d.Model")


def test_value_overrides_and_types():
    cfg = _compose(
        ["trainer.max_epochs=7", "datamodule.fake_data=true", "+new_key=1.5", "~debug"]
    )
    assert cfg["trainer"]["max_epochs"] == 7
    assert cfg["datamodule"]["fake_data"] is True
    assert cfg["new_key"] == 1.5
    assert "debug" not in cfg


def test_scientific_notation_overrides_are_floats():
    """PyYAML (YAML 1.1) keeps "1e-5" a string; hydra (YAML 1.2) parses a
    float — a string learning rate crashes the optimiser, so the composer
    post-corrects (sweeps format float dims exactly this way)."""
    from predict_pv_yield_tpu.config.composer import parse_override_value

    assert parse_override_value("1e-5") == 1e-5
    assert parse_override_value("2.5e3") == 2500.0
    assert parse_override_value("-1E+2") == -100.0
    assert parse_override_value("1e-5x") == "1e-5x"  # not a number
    assert parse_override_value("null") is None
    cfg = _compose(["+model.lr=1e-5"])
    assert cfg["model"]["lr"] == 1e-5


def test_package_marker_in_prose_is_not_global(tmp_path):
    """Only a real ``# @package _global_`` directive line promotes a file
    to a root overlay — mentioning the marker in a comment must not."""
    from predict_pv_yield_tpu.config.composer import _load_yaml

    direct = tmp_path / "direct.yaml"
    direct.write_text("# @package _global_\ntrainer:\n  max_epochs: 1\n")
    prose = tmp_path / "prose.yaml"
    prose.write_text(
        "# note: this is not a '@package _global_' file\nkey: 1\n"
    )
    assert _load_yaml(str(direct))[1] is True
    assert _load_yaml(str(prose))[1] is False


def test_interpolation():
    cfg = _compose()
    assert cfg["work_dir"] == os.getcwd()
    assert cfg["data_dir"] == os.path.join(os.getcwd(), "data/")


def test_env_interpolation(monkeypatch, tmp_path):
    monkeypatch.setenv("MY_TEST_VAR", "hello")
    cfg = _compose(["+extra=${oc.env:MY_TEST_VAR}"])
    assert cfg["extra"] == "hello"


def test_instantiate_with_reference_targets():
    """Reference _target_ strings resolve to native classes (alias table)."""
    from predict_pv_yield_tpu.models.conv3d import Model as NativeConv3d
    from predict_pv_yield_tpu.training.engine import Trainer

    assert locate("predict_pv_yield.models.conv3d.model.Model") is NativeConv3d
    trainer = instantiate(
        {
            "_target_": "pytorch_lightning.Trainer",
            "gpus": 0,  # Lightning-only knob: accepted and dropped
            "max_epochs": 3,
            "profiler": None,
        }
    )
    assert isinstance(trainer, Trainer)
    assert trainer.max_epochs == 3


def test_deep_merge():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    deep_merge(base, {"a": {"b": 9}, "e": 4})
    assert base == {"a": {"b": 9, "c": 2}, "d": 3, "e": 4}


def test_many_loggers_group():
    cfg = _compose(["logger=many_loggers"])
    assert "csv" in cfg["logger"]
    assert "tensorboard" in cfg["logger"]


def test_experiment_configs_all_compose():
    """Every experiment overlay composes and re-selects its model."""
    import os

    experiments = sorted(
        f[:-5]
        for f in os.listdir(os.path.join(CONFIG_DIR, "experiment"))
        if f.endswith(".yaml")
    )
    assert len(experiments) >= 11
    for name in experiments:
        cfg = _compose([f"experiment={name}"])
        assert "_target_" in cfg["model"], name
        assert "seed" in cfg, name


def test_model_configs_all_instantiate():
    """Every model yaml builds its flax module."""
    import os

    for f in sorted(os.listdir(os.path.join(CONFIG_DIR, "model"))):
        cfg = _compose([f"model={f[:-5]}"])
        model = instantiate(cfg["model"])
        assert hasattr(model, "model_name") or hasattr(model, "channels"), f
