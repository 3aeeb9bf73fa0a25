"""Diagnostic: per-epoch validation NMAE for the perceiver learning gate.

Trains perceiver_conv3d_sat_nwp on the learnable synthetic archive through
the real train() pipeline at several learning rates and prints the
NMAE/Validation_epoch trajectory from the CSV logger, plus the train-loss
trajectory — to tell "undertrained" apart from "structurally can't learn".
Scratch tool for the round-5 learning-gate work; not part of the bench.
"""

import csv
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from predict_pv_yield_tpu.config.composer import compose
from predict_pv_yield_tpu.data.synthetic import make_learnable_archive
from predict_pv_yield_tpu.training.pipeline import train

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
METRIC = "NMAE/Validation_epoch"


def common(arch, batch_size=8):
    return [
        "logger=csv",
        "callbacks=none",
        "datamodule=zarr_stream",
        f"datamodule.zarr_path={arch.satellite_zarr}",
        f"datamodule.gsp_csv={arch.gsp_csv}",
        "datamodule.n_gsp=1",
        f"datamodule.batch_size={batch_size}",
        "datamodule.history_minutes=30",
        "datamodule.forecast_minutes=30",
        "datamodule.satellite_image_size_pixels=24",
        "datamodule.n_val_data=8",
        "datamodule.num_workers=2",
        "datamodule.seed=0",
        f"+optimized_metric={METRIC}",
    ]


def run_one(arch, lr, epochs, extra=()):
    wd = tempfile.mkdtemp(prefix=f"probe_lr{lr}_")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        config = compose(
            config_name="config",
            overrides=common(arch)
            + [
                "model=perceiver_conv3d_sat_nwp",
                "model.history_minutes=30",
                "model.forecast_minutes=30",
                "model.batch_size=8",
                "model.num_latents=12",
                "model.latent_dim=16",
                "model.conv3d_channels=4",
                "model.use_future_satellite_images=1",
                f"datamodule.nwp_zarr_path={arch.nwp_zarr}",
                "datamodule.nwp_image_size_pixels=24",
                "datamodule.n_train_data=32",
                f"trainer.max_epochs={epochs}",
                f"+trainer.learning_rate={lr}",
            ]
            + list(extra),
            config_dir=CONFIG_DIR,
        )
        result = train(config)
        rows = []
        for path in glob.glob(
            os.path.join(wd, "**", "metrics.csv"), recursive=True
        ):
            with open(path) as fh:
                rows.extend(csv.DictReader(fh))
        val = [
            (r.get("epoch", r.get("step", "?")), r[METRIC])
            for r in rows
            if r.get(METRIC) not in (None, "")
        ]
        tr = [
            (r.get("epoch", r.get("step", "?")), r["MSE/Train_epoch"])
            for r in rows
            if r.get("MSE/Train_epoch") not in (None, "")
        ]
        print(f"lr={lr} epochs={epochs} extra={list(extra)}")
        print(f"  final {METRIC}: {result}")
        print(f"  val NMAE trajectory: {val}")
        print(f"  train MSE trajectory: {tr}")
        sys.stdout.flush()
        return float(result) if result is not None else None
    finally:
        os.chdir(cwd)


def main():
    root = tempfile.mkdtemp(prefix="learnable_probe_")
    arch = make_learnable_archive(
        root, n_frames=288, px=24, n_gsp=4, seed=0, with_nwp=True
    )

    # baseline for scale
    wd = tempfile.mkdtemp(prefix="probe_baseline_")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        config = compose(
            config_name="config",
            overrides=common(arch)
            + [
                "model=baseline",
                "model.history_minutes=30",
                "model.forecast_minutes=30",
                "+validate_only=1",
            ],
            config_dir=CONFIG_DIR,
        )
        print("baseline NMAE:", train(config))
        sys.stdout.flush()
    finally:
        os.chdir(cwd)

    for lr, epochs, extra in [
        (2e-3, 16, ()),
        (5e-3, 16, ()),
        (1e-3, 16, ()),
    ]:
        run_one(arch, lr, epochs, extra)


def run_small(arch, lr, epochs, batch=4, latents=8, ldim=12, extra=()):
    """Cheaper candidate config for the in-suite gate (1-core CI host)."""
    import time

    wd = tempfile.mkdtemp(prefix=f"probe_small_lr{lr}_")
    cwd = os.getcwd()
    os.chdir(wd)
    t0 = time.monotonic()
    try:
        config = compose(
            config_name="config",
            overrides=common(arch, batch_size=batch)
            + [
                "model=perceiver_conv3d_sat_nwp",
                "model.history_minutes=30",
                "model.forecast_minutes=30",
                f"model.batch_size={batch}",
                f"model.num_latents={latents}",
                f"model.latent_dim={ldim}",
                "model.conv3d_channels=4",
                "model.use_future_satellite_images=1",
                f"datamodule.nwp_zarr_path={arch.nwp_zarr}",
                "datamodule.nwp_image_size_pixels=16",
                "datamodule.satellite_image_size_pixels=16",
                "model.image_size_pixels=16",
                "datamodule.n_train_data=32",
                f"trainer.max_epochs={epochs}",
                f"+trainer.learning_rate={lr}",
            ]
            + list(extra),
            config_dir=CONFIG_DIR,
        )
        result = train(config)
        rows = []
        for path in glob.glob(os.path.join(wd, "**", "metrics.csv"), recursive=True):
            with open(path) as fh:
                rows.extend(csv.DictReader(fh))
        val = [r[METRIC] for r in rows if r.get(METRIC)]
        print(f"SMALL lr={lr} b={batch} lat={latents}/{ldim} epochs={epochs} "
              f"wall={time.monotonic()-t0:.0f}s extra={list(extra)}")
        print(f"  final: {result}  best: {min(float(v) for v in val):.4f}")
        print(f"  val NMAE: {[f'{float(v):.3f}' for v in val]}")
        sys.stdout.flush()
    finally:
        os.chdir(cwd)


def main_small():
    root = tempfile.mkdtemp(prefix="learnable_probe16_")
    arch = make_learnable_archive(root, n_frames=288, px=16, n_gsp=4, seed=0, with_nwp=True)
    wd = tempfile.mkdtemp(prefix="probe_baseline16_")
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        config = compose(
            config_name="config",
            overrides=common(arch, batch_size=4)
            + ["model=baseline", "model.history_minutes=30",
               "model.forecast_minutes=30", "+validate_only=1",
               "datamodule.satellite_image_size_pixels=16"],
            config_dir=CONFIG_DIR,
        )
        print("baseline(16px,b4) NMAE:", train(config))
        sys.stdout.flush()
    finally:
        os.chdir(cwd)
    run_small(arch, 2e-3, 16)
    run_small(arch, 1e-3, 16)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        main_small()
    else:
        main()
