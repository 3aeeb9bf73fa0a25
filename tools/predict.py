"""Batch inference from a checkpoint.

The reference's inference story is a snippet — ``pl_load`` +
``load_state_dict`` (reference ``experiments/2021-09/2021-09-03/conv3d.py:
10-23``). This is the productionised equivalent: restore a native orbax
checkpoint (or convert a reference Lightning ``.ckpt`` on the fly for
conv3d-family models), run the jitted forward over a shard directory or fake
data, and write forecasts as CSV.

    python tools/predict.py --model conv3d --model-config configs/model/conv3d.yaml \
        --checkpoint checkpoints/epoch_003 --data /path/to/prepared --n-batches 10 \
        --out forecasts.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True, help="model-zoo name (e.g. conv3d)")
    parser.add_argument("--model-config", required=True, help="model hyperparameter yaml")
    parser.add_argument("--checkpoint", help="orbax checkpoint dir or Lightning .ckpt")
    parser.add_argument("--data", help="prepared dataset dir (omit for fake data)")
    parser.add_argument("--n-batches", type=int, default=10)
    parser.add_argument("--out", default="forecasts.csv")
    parser.add_argument(
        "--nmae", action="store_true",
        help="also print NMAE (plain mean |error|, the reference's training "
        "metric name) against the dataset's targets — the PRED-189 scoring "
        "path (weights/conv3d/readme.md)",
    )
    args = parser.parse_args()

    from run import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    import pandas as pd

    from predict_pv_yield_tpu.data.loader import NetCDFDataModule
    from predict_pv_yield_tpu.models import MODEL_REGISTRY, _register_experimental, _register_perceivers
    from predict_pv_yield_tpu.training.engine import Trainer
    from predict_pv_yield_tpu.utils import load_config

    _register_experimental()
    _register_perceivers()
    model_config = load_config(args.model_config)
    model_cls = MODEL_REGISTRY[args.model]
    model = model_cls(**model_config)

    if args.data:
        datamodule = NetCDFDataModule(
            data_path=args.data, n_val_data=args.n_batches, num_workers=4
        )
        loader = datamodule.test_dataloader()
    else:
        # fake data shaped to the model's own geometry
        from predict_pv_yield_tpu.config.dataset import Configuration
        from predict_pv_yield_tpu.data.fake import FakeDataset

        configuration = Configuration()
        configuration.process.batch_size = min(getattr(model, "batch_size", 32), 32)
        configuration.input_data.default_history_minutes = model.history_minutes
        configuration.input_data.default_forecast_minutes = model.forecast_minutes
        configuration.input_data = configuration.input_data.set_all_to_defaults()
        sat = configuration.input_data.satellite
        if hasattr(model, "image_size_pixels"):
            sat.satellite_image_size_pixels = model.image_size_pixels
        if hasattr(model, "number_sat_channels"):
            sat.satellite_channels = sat.satellite_channels[: model.number_sat_channels]
        nwp = configuration.input_data.nwp
        if hasattr(model, "nwp_image_size_pixels"):
            nwp.nwp_image_size_pixels = model.nwp_image_size_pixels
        if hasattr(model, "number_nwp_channels"):
            nwp.nwp_channels = nwp.nwp_channels[: model.number_nwp_channels]
        loader = FakeDataset(configuration=configuration, length=args.n_batches)

    trainer = Trainer(max_epochs=1, profiler=None)
    if args.checkpoint and args.checkpoint.endswith(".ckpt"):
        # reference Lightning checkpoint → convert
        from predict_pv_yield_tpu.convert import (
            convert_conv3d,
            convert_conv3d_sat_nwp,
            convert_perceiver_model,
            load_lightning_checkpoint,
        )

        state_dict = load_lightning_checkpoint(args.checkpoint)
        converter = {
            "conv3d": convert_conv3d,
            "conv3d_sat_nwp": convert_conv3d_sat_nwp,
            "perceiver": convert_perceiver_model,
        }.get(args.model)
        if converter is None:
            raise SystemExit(f"no torch converter for model {args.model}")
        trainer.setup(model, trainer._example_batch(loader))
        trainer.state = trainer.state.replace(params=converter(state_dict, model))
    elif args.checkpoint:
        trainer.resume_from_checkpoint = args.checkpoint
        trainer.setup(model, trainer._example_batch(loader))

    predictions = trainer.predict(model, dataloaders=loader)

    rows = []
    for batch_idx, y_hat in enumerate(predictions):
        for example_idx, forecast in enumerate(np.asarray(y_hat)):
            for horizon, value in enumerate(forecast, start=1):
                rows.append(
                    {
                        "batch_index": batch_idx,
                        "example_index": example_idx,
                        "forecast_horizon": horizon,
                        "forecast": float(value),
                    }
                )
    pd.DataFrame(rows).to_csv(args.out, index=False)
    print(f"wrote {len(rows)} forecasts to {args.out}")

    if args.nmae:
        # the reference's "NMAE" is plain mean |error| (base_model.py:98-103)
        # over the target slice y[0:bs, -forecast_len:, 0]
        errors = []
        for y_hat, batch in zip(predictions, loader):
            target = np.asarray(model.target(batch))
            errors.append(np.abs(np.asarray(y_hat) - target).reshape(-1))
        nmae = float(np.mean(np.concatenate(errors)))
        print(f"NMAE: {nmae:.6f}")


if __name__ == "__main__":
    main()
