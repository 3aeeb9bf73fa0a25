"""Perceiver GSP-target tests — mirrors reference
``tests/models/perceiver/test_perceiver_gsp.py``."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params


def test_model_forward_gsp(configuration_perceiver):
    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.satellite.satellite_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60

    model = PerceiverModel(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        output_variable="gsp_yield",
        num_latents=8,
        latent_dim=16,
    )
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)

    assert len(y.shape) == 2
    assert y.shape[0] == dataset_configuration.process.batch_size
    assert y.shape[1] == 60 // 30
