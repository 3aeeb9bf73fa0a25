"""Diagnostic: per-epoch validation NMAE for the perceiver learning gate.

Trains perceiver_conv3d_sat_nwp on the learnable synthetic archive through
the real train() pipeline at several learning rates and prints the
NMAE/Validation_epoch trajectory from the CSV logger, plus the train-loss
trajectory — to tell "undertrained" apart from "structurally can't learn".
Scratch tool for the round-5 learning-gate work; not part of the bench.

The override blocks and runner are single-sourced in ``data/synthetic.py``
(shared with tests/test_learning_gate.py and bench.py's learning-gate leg).
"""

import csv
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from predict_pv_yield_tpu.data.synthetic import (  # noqa: E402
    BASELINE_GATE_OVERRIDES,
    GATE_METRIC as METRIC,
    make_learnable_archive,
    perceiver_gate_overrides,
    run_learnable,
)


def _rows(workdir):
    rows = []
    for path in glob.glob(
        os.path.join(workdir, "**", "metrics.csv"), recursive=True
    ):
        with open(path) as fh:
            rows.extend(csv.DictReader(fh))
    return rows


def run_one(arch, lr, epochs, extra=()):
    wd = tempfile.mkdtemp(prefix=f"probe_lr{lr}_")
    result = run_learnable(
        arch,
        perceiver_gate_overrides(arch)
        + [f"trainer.max_epochs={epochs}", f"+trainer.learning_rate={lr}"]
        + list(extra),
        workdir=wd,
    )
    rows = _rows(wd)
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
    return result


def main():
    root = tempfile.mkdtemp(prefix="learnable_probe_")
    arch = make_learnable_archive(
        root, n_frames=288, px=24, n_gsp=4, seed=0, with_nwp=True
    )

    # baseline for scale
    baseline = run_learnable(
        arch,
        BASELINE_GATE_OVERRIDES,
        workdir=tempfile.mkdtemp(prefix="probe_baseline_"),
    )
    print("baseline NMAE:", baseline)
    sys.stdout.flush()

    for lr, epochs, extra in [
        (2e-3, 16, ()),
        (5e-3, 16, ()),
        (1e-3, 16, ()),
    ]:
        run_one(arch, lr, epochs, extra)


def run_small(arch, lr, epochs, batch=4, latents=8, ldim=12, extra=()):
    """Cheaper candidate config for the in-suite gate (1-core CI host):
    the shared perceiver gate overrides shrunk to 16 px / smaller latents."""
    import time

    wd = tempfile.mkdtemp(prefix=f"probe_small_lr{lr}_")
    t0 = time.monotonic()
    result = run_learnable(
        arch,
        perceiver_gate_overrides(arch)
        + [
            f"model.batch_size={batch}",
            f"model.num_latents={latents}",
            f"model.latent_dim={ldim}",
            "datamodule.nwp_image_size_pixels=16",
            "datamodule.satellite_image_size_pixels=16",
            "model.image_size_pixels=16",
            f"trainer.max_epochs={epochs}",
            f"+trainer.learning_rate={lr}",
        ]
        + list(extra),
        batch_size=batch,
        workdir=wd,
    )
    val = [r[METRIC] for r in _rows(wd) if r.get(METRIC)]
    print(f"SMALL lr={lr} b={batch} lat={latents}/{ldim} epochs={epochs} "
          f"wall={time.monotonic()-t0:.0f}s extra={list(extra)}")
    print(f"  final: {result}  best: {min(float(v) for v in val):.4f}")
    print(f"  val NMAE: {[f'{float(v):.3f}' for v in val]}")
    sys.stdout.flush()


def main_small():
    root = tempfile.mkdtemp(prefix="learnable_probe16_")
    arch = make_learnable_archive(
        root, n_frames=288, px=16, n_gsp=4, seed=0, with_nwp=True
    )
    baseline = run_learnable(
        arch,
        BASELINE_GATE_OVERRIDES
        + ["datamodule.satellite_image_size_pixels=16"],
        batch_size=4,
        workdir=tempfile.mkdtemp(prefix="probe_baseline16_"),
    )
    print("baseline(16px,b4) NMAE:", baseline)
    sys.stdout.flush()
    run_small(arch, 2e-3, 16)
    run_small(arch, 1e-3, 16)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        main_small()
    else:
        main()
