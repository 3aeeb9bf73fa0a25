"""Raw-int16 satellite shards: decode fuses into the jitted step."""

import jax
import numpy as np

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.consts import SAT_MEAN, SAT_STD
from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.conv3d import Model
from predict_pv_yield_tpu.training.engine import Trainer
from predict_pv_yield_tpu.utils import load_config


def _int16_batch(configuration):
    """Fake batch whose satellite field is raw int16 counts."""
    batch = FakeDataset(configuration=configuration)[0]
    rng = np.random.default_rng(0)
    raw = rng.integers(-1, 1023, size=batch.satellite.data.shape, dtype=np.int16)
    return batch.replace(satellite=batch.satellite.replace(data=raw)), raw


def test_in_step_decode_matches_host_decode(configuration_conv3d):
    config = load_config("tests/configs/model/conv3d.yaml")
    model = Model(**config)
    batch, raw = _int16_batch(configuration_conv3d)

    trainer = Trainer(max_epochs=1, profiler=None)
    trainer.setup(model, batch)
    device_batch = jax.device_put(batch.numeric(), trainer._batch_shard)
    metrics_raw, _, _, y_raw = trainer._compiled["eval"](trainer.state, device_batch)

    # host-side decode with the documented formula (netcdf_dataset.py:96-101)
    n_chans = raw.shape[1]
    mean = SAT_MEAN[1 : 1 + n_chans]
    std = SAT_STD[1 : 1 + n_chans]
    decoded = (raw.astype(np.float32) - mean[None, :, None, None, None]) / std[
        None, :, None, None, None
    ]
    decoded[raw == -1] = 0.0
    host_batch = batch.replace(
        satellite=batch.satellite.replace(data=decoded)
    )
    host_device = jax.device_put(host_batch.numeric(), trainer._batch_shard)
    metrics_host, _, _, y_host = trainer._compiled["eval"](trainer.state, host_device)

    np.testing.assert_allclose(
        np.asarray(y_raw), np.asarray(y_host), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_raw["NMAE"]), float(metrics_host["NMAE"]), rtol=1e-5
    )


def test_training_on_int16(configuration_conv3d, tmp_cwd):
    config = load_config("tests/configs/model/conv3d.yaml")
    model = Model(**config)
    batch, _ = _int16_batch(configuration_conv3d)

    class RawDataset:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            if not 0 <= i < 2:
                raise IndexError(i)
            return batch

    trainer = Trainer(max_epochs=1, profiler=None, save_validation_plots=False)
    metrics = trainer.fit(model, train_dataloaders=RawDataset())
    assert np.isfinite(metrics["NMAE/Train_epoch"])
