"""perceiver_conv3d_nwp_sat tests — mirrors reference
``tests/models/perceiver/test_perceiver_conv3d_sat_nwp.py`` incl. the
``use_future_satellite_images=False`` flag (``:42-65``)."""

import jax
import numpy as np

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.perceiver import params
from predict_pv_yield_tpu.models.perceiver_conv3d_nwp_sat import Model


def _build(configuration_perceiver, **kwargs):
    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.default_forecast_minutes = 60
    model = Model(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        embedding_dem=16,
        num_latents=8,
        latent_dim=16,
        conv3d_channels=8,
        **kwargs,
    )
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    return model, batch


def test_model_forward(configuration_perceiver):
    model, batch = _build(configuration_perceiver)
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, 60 // 5)


def test_model_forward_no_future_satellite(configuration_perceiver):
    model, batch = _build(configuration_perceiver, use_future_satellite_images=False)
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, 60 // 5)

    # zeroing future frames changes the output vs using them
    model_with, _ = _build(configuration_perceiver, use_future_satellite_images=True)
    y_with = model_with.apply(variables, batch)
    assert not np.allclose(np.asarray(y), np.asarray(y_with))
