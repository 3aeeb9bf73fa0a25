"""The PRED-189 scoring runbook, kept executable (VERDICT r3 #8).

The reference pins a trained conv3d checkpoint's provenance and
hyperparameters (Neptune PRED-189: conv3d_channels 32, fc1/fc2 128, fc3 64,
6 layers — reference ``weights/conv3d/readme.md:1-9``) but ships no weight
file, and this image has no network — so the NMAE-parity number itself is
environment-blocked. What CAN be gated is the runbook: this test

1. extracts the documented ``python tools/predict.py ...`` command VERBATIM
   from ``weights/conv3d/readme.md`` (drift between doc and tool fails here),
2. synthesizes a Lightning ``.ckpt`` with the PRED-189 hyperparameters
   (native init exported through ``convert.export_conv3d`` — the exact
   torch-layout state_dict a real Lightning checkpoint carries, wrapped in
   the ``{"state_dict": ..., "hyper_parameters": ...}`` envelope), and
3. runs the command end to end, checking the forecasts CSV contract and
   that the NMAE plumbing produces a finite number.

The day someone supplies the real file, the documented command runs
unmodified and prints the parity NMAE.
"""

from __future__ import annotations

import os
import re
import shlex
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _runbook_command() -> list:
    """The documented command, verbatim from the runbook's code block."""
    with open(os.path.join(REPO, "weights", "conv3d", "readme.md")) as fh:
        text = fh.read()
    match = re.search(r"```\n(python tools/predict\.py.*?)```", text, re.S)
    assert match, "runbook no longer documents the predict command"
    return shlex.split(match.group(1).replace("\\\n", " "))


@pytest.fixture()
def synthesized_pred189_ckpt(tmp_path):
    """A Lightning-format .ckpt at the PRED-189 hyperparameters."""
    import torch

    import jax

    from predict_pv_yield_tpu.config.dataset import Configuration
    from predict_pv_yield_tpu.convert import export_conv3d
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.models.conv3d import Model
    from predict_pv_yield_tpu.utils import load_config

    hparams = load_config(os.path.join(REPO, "configs", "model", "conv3d.yaml"))
    assert hparams["conv3d_channels"] == 32  # the PRED-189 pin
    assert hparams["fc1_output_features"] == 128
    assert hparams["fc2_output_features"] == 128
    assert hparams["fc3_output_features"] == 64
    assert hparams["number_of_conv3d_layers"] == 6
    model = Model(**hparams)

    configuration = Configuration()
    configuration.process.batch_size = 2
    configuration.input_data.default_history_minutes = model.history_minutes
    configuration.input_data.default_forecast_minutes = model.forecast_minutes
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = (
        model.image_size_pixels
    )
    configuration.input_data.satellite.satellite_channels = list(
        configuration.input_data.satellite.satellite_channels
    )[: model.number_sat_channels]
    batch = fake_batch(configuration, np.random.default_rng(0))
    # eager init on purpose: under jit the closed-over batch bakes into the
    # HLO as constants and XLA's constant folding makes the compile ~4x
    # slower than just running init eagerly (~9s) on the 1-core CI host
    variables = model.init(jax.random.key(189), batch)

    state_dict = {
        key: torch.from_numpy(np.array(value))  # copy: torch refuses
        for key, value in export_conv3d(variables, model).items()  # read-only
    }
    path = tmp_path / "PRED-189.ckpt"
    torch.save(
        {
            "state_dict": state_dict,
            "hyper_parameters": dict(hparams),
            "epoch": 10,
            "global_step": 249000,
        },
        path,
    )
    return path


def test_runbook_command_runs_verbatim(synthesized_pred189_ckpt, tmp_path):
    command = _runbook_command()
    assert command[:2] == ["python", "tools/predict.py"]
    command[0] = sys.executable
    # the two user-supplied paths; everything else stays as documented
    command[command.index("path/to/PRED-189.ckpt")] = str(synthesized_pred189_ckpt)
    out_csv = tmp_path / "forecasts.csv"
    command[command.index("forecasts.csv")] = str(out_csv)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/predict_pv_yield_tpu_xla_cache"
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    result = subprocess.run(
        command, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    assert result.returncode == 0, result.stderr[-2000:]

    # forecasts CSV contract: conv3d.yaml is gsp_yield at 120 forecast
    # minutes -> batch 32, forecast_len_30 = 4, 5 batches (the runbook
    # documents 5: enough for a stable NMAE mean and half the wall time of
    # 10 on a 1-core CI host — each PRED-189-size b32 forward is ~3s there)
    forecasts = pd.read_csv(out_csv)
    assert list(forecasts.columns) == [
        "batch_index", "example_index", "forecast_horizon", "forecast",
    ]
    assert len(forecasts) == 5 * 32 * 4
    assert np.isfinite(forecasts["forecast"]).all()

    # the NMAE plumbing end-to-end: printed, parseable, finite
    match = re.search(r"NMAE: ([0-9.]+)", result.stdout)
    assert match, result.stdout
    assert np.isfinite(float(match.group(1)))
