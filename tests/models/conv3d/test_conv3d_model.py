"""conv3d model tests — mirrors reference
``tests/models/conv3d/test_conv3d_model.py`` (init / forward / train)."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d import Model
from predict_pv_yield_tpu.training.engine import Trainer
from predict_pv_yield_tpu.utils import load_config


def test_init():
    config = load_config("configs/model/conv3d.yaml")
    _ = Model(**config)


def test_model_forward(configuration_conv3d):
    config = load_config("tests/configs/model/conv3d.yaml")
    model = Model(**config)
    batch = FakeDataset(configuration=configuration_conv3d)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)
    assert len(y.shape) == 2
    assert y.shape[0] == 2
    assert y.shape[1] == model.forecast_len_5


def test_train(configuration_conv3d, tmp_cwd):
    config = load_config("tests/configs/model/conv3d.yaml")
    model = Model(**config)
    ds = FakeDataset(configuration=configuration_conv3d)
    ds.length = 2
    trainer = Trainer(max_epochs=1, profiler=None)
    trainer.fit(model, train_dataloaders=ds)
    predictions = trainer.predict(dataloaders=ds)
    assert len(predictions) == 2
    assert predictions[0].shape == (2, model.forecast_len_5)
