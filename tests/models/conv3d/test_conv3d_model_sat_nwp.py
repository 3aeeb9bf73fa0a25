"""conv3d_sat_nwp tests — mirrors reference
``tests/models/conv3d/test_conv3d_model_sat_nwp.py`` incl. the
``include_future_satellite=False`` feature flag (``:42-65``)."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d_sat_nwp import Model
from predict_pv_yield_tpu.utils import load_config
from predict_pv_yield_tpu.config.dataset import Configuration


def _dataset_configuration(config):
    dataset_configuration = Configuration()
    dataset_configuration.process.batch_size = 2
    dataset_configuration.input_data.default_history_minutes = config["history_minutes"]
    dataset_configuration.input_data.default_forecast_minutes = config["forecast_minutes"]
    dataset_configuration.input_data = dataset_configuration.input_data.set_all_to_defaults()
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = config["nwp_image_size_pixels"]
    dataset_configuration.input_data.satellite.satellite_image_size_pixels = config[
        "image_size_pixels"
    ]
    return dataset_configuration


def test_init():
    config = load_config("configs/model/conv3d_sat_nwp.yaml")
    _ = Model(**config)


def test_model_forward(configuration_conv3d):
    config = load_config("tests/configs/model/conv3d_sat_nwp.yaml")
    model = Model(**config)
    dataset_configuration = _dataset_configuration(config)
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, model.forecast_len_30)


def test_model_forward_no_future_satellite():
    config = load_config("tests/configs/model/conv3d_sat_nwp.yaml")
    config["include_future_satellite"] = False
    model = Model(**config)
    dataset_configuration = _dataset_configuration(config)
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, model.forecast_len_30)
