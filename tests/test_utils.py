"""Harness-utils smoke tests (reference ``tests/test_utils.py:9-21``)."""

import os

from predict_pv_yield_tpu.utils import extras, load_config, print_config


def test_extras_debug_forces_fast_dev_run():
    config = {
        "debug": True,
        "trainer": {},
        "datamodule": {"num_workers": 8, "pin_memory": True},
    }
    extras(config)
    assert config["trainer"]["fast_dev_run"] is True
    assert config["datamodule"]["num_workers"] == 0
    assert config["datamodule"]["pin_memory"] is False


def test_print_config(tmp_cwd):
    config = {
        "trainer": {"max_epochs": 3},
        "model": {"_target_": "x"},
        "datamodule": {},
        "seed": 1,
    }
    print_config(config)
    assert os.path.exists("config_tree.txt")
    with open("config_tree.txt") as fh:
        assert "max_epochs" in fh.read()


def test_load_config_strips_target():
    config = load_config("configs/model/conv3d.yaml")
    assert "_target_" not in config
    assert config["conv3d_channels"] == 32
