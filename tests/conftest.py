"""Test fixtures.

Mirrors the reference's fixture strategy (reference ``tests/conftest.py:7-49``):
three dataset Configuration builders shaping the fake-data backend. All tests
run on an 8-device virtual CPU mesh so the *real* pjit/mesh code path is
exercised without hardware — the distributed-testing upgrade the reference
lacks (SURVEY §4, "Distributed testing: none").
"""

import os

# Force the CPU backend with 8 virtual devices BEFORE the backend initialises.
# (A sitecustomize may have fully imported jax already and pinned
# jax_platforms at real hardware, so the env var alone is not enough — the
# config flags below win as long as no device has been touched yet.)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialised (e.g. single-test debugging)

import pytest

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.utils import load_config


@pytest.fixture()
def configuration():
    configuration = Configuration()
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.process.batch_size = 2
    configuration.input_data.default_history_minutes = 30
    configuration.input_data.default_forecast_minutes = 60
    configuration.input_data.nwp.nwp_image_size_pixels = 16
    return configuration


@pytest.fixture()
def configuration_conv3d():
    config = load_config("tests/configs/model/conv3d.yaml")

    dataset_configuration = Configuration()
    dataset_configuration.process.batch_size = 2
    dataset_configuration.input_data.default_history_minutes = config["history_minutes"]
    dataset_configuration.input_data.default_forecast_minutes = config["forecast_minutes"]
    dataset_configuration.input_data = dataset_configuration.input_data.set_all_to_defaults()
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 2
    dataset_configuration.input_data.satellite.satellite_image_size_pixels = config[
        "image_size_pixels"
    ]
    dataset_configuration.input_data.satellite.forecast_minutes = config["forecast_minutes"]
    dataset_configuration.input_data.satellite.history_minutes = config["history_minutes"]
    return dataset_configuration


@pytest.fixture()
def configuration_perceiver():
    dataset_configuration = Configuration()
    dataset_configuration.input_data = dataset_configuration.input_data.set_all_to_defaults()
    dataset_configuration.process.batch_size = 2
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.satellite.satellite_image_size_pixels = 16
    dataset_configuration.input_data.default_history_minutes = 30
    dataset_configuration.input_data.default_forecast_minutes = 120
    dataset_configuration.input_data.nwp.nwp_channels = (
        dataset_configuration.input_data.nwp.nwp_channels[0:10]
    )
    return dataset_configuration


@pytest.fixture()
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test inside a temp directory (checkpoints, CSVs, plots)."""
    monkeypatch.chdir(tmp_path)
    return tmp_path
