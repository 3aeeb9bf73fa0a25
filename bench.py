"""Headline benchmark: conv3d_sat_nwp training throughput on one TPU chip.

Prints exactly one JSON line:

    {"metric": ..., "value": N, "unit": "batches/s/chip", "vs_baseline": N/B}

Setup mirrors the reference's flagship training run (``configs/model/
conv3d_sat_nwp.yaml``: 24 px satellite, 11 channels, 6 conv layers, 30 min
history, 120 min forecast, GSP target, batch 32; reference
``configs/experiment/conv3d_sat_nwp.yaml``). The measured quantity is full
training steps (forward + backward + Adam update) per second with bf16
activations, batches synthesised directly in HBM so host IO is excluded —
the pure-compute ceiling the input pipeline must keep fed.

Baseline ``B = 4.2`` batches/s: the reference's lab notes record "about 4
minutes to run the validation epoch" for its conv3d runs on a GCP GPU with
1000 validation batches (reference ``experiments/2021-09/2021-09-27/
experiments.txt``, ``configs/datamodule/netcdf_datamodule_gcp.yaml:
n_val_data=1000``) → ≈4.2 *inference* batches/s. Comparing our *training*
steps against their inference rate is conservative in our favour's opposite:
training ≈3× the FLOPs of inference.
"""

from __future__ import annotations

import json
import time

import jax

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.data.fake import fake_batch_on_device
from predict_pv_yield_tpu.models.conv3d_sat_nwp import Model
from predict_pv_yield_tpu.training.engine import Trainer

BASELINE_BATCHES_PER_SEC = 4.2
WARMUP_STEPS = 10
MEASURE_STEPS = 200


def flagship_configuration(batch_size: int = 32) -> Configuration:
    configuration = Configuration()
    configuration.process.batch_size = batch_size
    configuration.input_data.default_history_minutes = 30
    configuration.input_data.default_forecast_minutes = 120
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = 24
    configuration.input_data.nwp.nwp_image_size_pixels = 64
    return configuration


def flagship_model() -> Model:
    # configs/model/conv3d_sat_nwp.yaml hyperparameters.
    return Model(
        include_pv_or_gsp_yield_history=True,
        include_nwp=True,
        forecast_minutes=120,
        history_minutes=30,
        number_of_conv3d_layers=6,
        image_size_pixels=24,
        nwp_image_size_pixels=64,
        number_sat_channels=11,
        number_nwp_channels=10,
        conv3d_channels=32,
        fc1_output_features=128,
        fc2_output_features=128,
        fc3_output_features=64,
        output_variable="gsp_yield",
        include_pv_yield_history=False,
        include_future_satellite=True,
    )


def main() -> None:
    batch_size = 32
    configuration = flagship_configuration(batch_size)
    model = flagship_model()

    trainer = Trainer(max_epochs=1, profiler=None, precision=16, prefetch_depth=1)
    batch = fake_batch_on_device(configuration, seed=0)
    trainer.setup(model, batch)
    batch = jax.device_put(
        trainer._maybe_cast(batch.numeric()), trainer._batch_shard
    )

    step = trainer._compiled["train"]
    state = trainer.state
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    jax.device_get(metrics)  # full host sync (block_until_ready alone can
    # return early through the remote-execution tunnel)

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step(state, batch)
    jax.device_get(metrics)
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    batches_per_sec_per_chip = MEASURE_STEPS / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "conv3d_sat_nwp train batches/sec/chip (b32, bf16)",
                "value": round(batches_per_sec_per_chip, 3),
                "unit": "batches/s/chip",
                "vs_baseline": round(
                    batches_per_sec_per_chip / BASELINE_BATCHES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
