"""End-to-end learning gates: natively-trained yield models must beat the
last-value persistence baseline.

The reference's reason to exist is trained models that beat persistence —
conv3d MAE 0.0401 vs baseline 0.0562 (reference
``experiments/2021-09/2021-09-24/experiments.txt:12-17``), perceiver 0.0308
(``2021-09-28/experiments.txt:15-38``). Every other test in this suite proves
a component in isolation (forward parity, Adam-trajectory parity, fit
smokes); these gates prove the WHOLE — sampler → collate → device
preprocess → model → optimiser → validation NMAE — by training through the
real ``train()`` pipeline on a learnable synthetic archive
(``data/synthetic.py``: yield is a deterministic function of satellite
brightness) and asserting the trained validation NMAE lands strictly below
the last-value baseline's on the SAME held-out split.

The override blocks and the compose→train runner are single-sourced in
``data/synthetic.py`` (``CONV3D_GATE_OVERRIDES`` etc.) and shared with
``bench.py``'s ``_learning_gate_bench`` — the driver artifact's
``trained_nmae``/``baseline_nmae`` keys measure exactly the models gated
here.
"""

import csv
import glob
import os

import pytest

from predict_pv_yield_tpu.data.synthetic import (
    BASELINE_GATE_OVERRIDES,
    CONV3D_GATE_OVERRIDES,
    GATE_METRIC,
    make_learnable_archive,
    perceiver_gate_overrides,
    run_learnable,
)

METRIC = GATE_METRIC


def _best_val_nmae(run_root):
    """Best validation NMAE across epochs, from the CSV logger's metrics.

    This is the score checkpoint selection deploys: the reference's
    ModelCheckpoint keeps the best validation epoch (min monitor,
    ``configs/callbacks/default.yaml:1-10``), not the last one — so "the
    framework learns" is judged on the best epoch, same as a real run.
    """
    scores = []
    for path in glob.glob(
        os.path.join(str(run_root), "**", "metrics.csv"), recursive=True
    ):
        with open(path) as fh:
            for row in csv.DictReader(fh):
                if row.get(METRIC):
                    scores.append(float(row[METRIC]))
    assert scores, f"no {METRIC} rows found under {run_root}"
    return min(scores)


def _run(archive, overrides, batch_size=8):
    result = run_learnable(archive, overrides, batch_size=batch_size)
    assert result is not None, f"{METRIC} missing from callback metrics"
    return result


def _baseline_nmae(arch):
    """Validation NMAE of the last-value persistence model on the same
    archive/split (the reference's ``model=baseline`` + validate_only)."""
    return _run(arch, BASELINE_GATE_OVERRIDES)


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("learnable")
    return make_learnable_archive(
        str(root), n_frames=288, px=24, n_gsp=4, seed=0, with_nwp=True
    )


def test_conv3d_sat_nwp_learns_beats_persistence(archive, tmp_cwd):
    """Train the conv3d flagship a few epochs through the real pipeline and
    gate trained < baseline with margin (the proto run landed ~0.07 vs
    ~0.126; the gate asserts <0.85x to absorb run-to-run jitter)."""
    trained = _run(
        archive, CONV3D_GATE_OVERRIDES + ["trainer.max_epochs=4"]
    )
    baseline = _baseline_nmae(archive)
    assert trained < 0.85 * baseline, (
        f"trained conv3d NMAE {trained:.4f} does not beat the last-value "
        f"baseline {baseline:.4f} — the framework did not learn the task"
    )


def test_perceiver_flagship_learns_beats_persistence(archive, tmp_cwd):
    """Same gate for the perceiver flagship (the reference's best model),
    with the real-NWP branch live: the synthetic archive's NWP channel
    forecasts the signal at valid time, so the model has both the
    future-satellite and NWP routes to beat persistence.

    The deeper perceiver needs ~400 optimiser steps before validation NMAE
    crosses persistence (measured trajectory: 0.165 at epoch 1 → 0.059 by
    epoch ~13, baseline 0.126), and per-epoch scores stay noisy near the
    end — so the gate trains 16 epochs and judges the BEST validation
    epoch, the score checkpoint selection deploys (see _best_val_nmae).
    """
    _run(
        archive,
        perceiver_gate_overrides(archive)
        + [
            "trainer.max_epochs=16",
            # The reference's fixed Adam 5e-4 needs whole epochs of real data
            # to move this (much deeper) model; at smoke scale we use the
            # engine's configurable rate instead (reference parity for the
            # 5e-4 default is pinned separately in tests/test_convert.py).
            "+trainer.learning_rate=1e-3",
        ],
        batch_size=8,
    )
    trained = _best_val_nmae(tmp_cwd)
    baseline = _baseline_nmae(archive)
    assert trained < 0.85 * baseline, (
        f"trained perceiver best-epoch NMAE {trained:.4f} does not beat the "
        f"last-value baseline {baseline:.4f} — the framework did not learn"
    )
