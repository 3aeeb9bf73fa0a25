"""conv3d_nwp tests — mirrors reference
``tests/models/conv3d/test_conv3d_model_nwp.py``."""

import jax

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d_nwp import Model
from predict_pv_yield_tpu.utils import load_config


def test_init():
    config = load_config("configs/model/conv3d_nwp.yaml")
    _ = Model(**config)


def test_model_forward():
    config = load_config("tests/configs/model/conv3d_nwp.yaml")
    model = Model(**config)

    dataset_configuration = Configuration()
    dataset_configuration.process.batch_size = 2
    dataset_configuration.input_data.default_history_minutes = config["history_minutes"]
    dataset_configuration.input_data.default_forecast_minutes = config["forecast_minutes"]
    dataset_configuration.input_data = dataset_configuration.input_data.set_all_to_defaults()
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = config["nwp_image_size_pixels"]

    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, model.forecast_len_30)
