"""Experiment-model tests (001 CNN-concat, 002 CNN+RNN)."""

import jax
import numpy as np

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.experimental import CNNConcatTimesteps, CNNRNN
from predict_pv_yield_tpu.training.engine import Trainer


def _configuration(image_size=64):
    configuration = Configuration()
    configuration.process.batch_size = 2
    configuration.input_data.default_history_minutes = 30
    configuration.input_data.default_forecast_minutes = 60
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = image_size
    configuration.input_data.nwp.nwp_image_size_pixels = 2
    return configuration


def test_cnn_concat_forward():
    configuration = _configuration()
    model = CNNConcatTimesteps(history_minutes=30, forecast_minutes=60)
    batch = FakeDataset(configuration=configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, model.forecast_len_5)


def test_cnn_rnn_forward_and_train(tmp_cwd):
    # 16 px / 4 channels: same forward + full fit coverage, ~1/4 the CPU
    # compile+compute of the original 24 px / 8 ch shape (suite-cost trim)
    configuration = _configuration(image_size=16)
    model = CNNRNN(history_minutes=30, forecast_minutes=60, channels=4, last_conv_channels=4)
    ds = FakeDataset(configuration=configuration, length=2)
    batch = ds[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert y.shape == (2, model.forecast_len_5)

    trainer = Trainer(max_epochs=1, profiler=None, save_validation_plots=False)
    metrics = trainer.fit(model, train_dataloaders=ds)
    assert np.isfinite(metrics["NMAE/Train_epoch"])
