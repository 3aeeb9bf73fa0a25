"""CLI entrypoint.

Native equivalent of reference ``run.py:16-43``:

    python run.py experiment=example_simple
    python run.py experiment=conv3d trainer.max_epochs=3 logger=csv
    python run.py -m hparams_search=conv3d_optuna experiment=conv3d_sat_nwp

Overrides use the same hydra syntax the reference documents; ``-m`` enables
multirun (hyperparameter sweep). A ``.env`` file in the working directory is
loaded into the environment first (the reference's dotenv behaviour,
``run.py:13``).
"""

from __future__ import annotations

import logging
import os
import sys


def load_dotenv(path: str = ".env") -> None:
    """Minimal .env loader (python-dotenv is not in this image)."""
    if not os.path.exists(path):
        return
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            os.environ[key.strip()] = value.strip().strip("'\"")


def _enable_persistent_compile_cache() -> None:
    """Opt-in-by-default persistent XLA compile cache: repeat CLI runs (and
    the test suite's subprocess drives — this jax build does NOT read
    JAX_COMPILATION_CACHE_DIR from the environment by itself) skip
    recompiling unchanged programs. Disable with JAX_NO_PERSISTENT_CACHE=1.
    One shared implementation for every entrypoint lives in the package."""
    from predict_pv_yield_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s][%(name)s] %(message)s")
    load_dotenv()
    _enable_persistent_compile_cache()

    multirun = False
    overrides = []
    for arg in argv:
        if arg in ("-m", "--multirun"):
            multirun = True
        else:
            overrides.append(arg)

    from predict_pv_yield_tpu.config.composer import compose
    from predict_pv_yield_tpu.training.pipeline import train
    from predict_pv_yield_tpu.utils import extras, print_config

    config = compose("config", overrides)
    launch_dir = os.getcwd()

    # every datamodule key that names a filesystem path (incl. the
    # zarr-stream archive/CSV paths)
    path_keys = (
        "data_path", "temp_path", "zarr_path", "nwp_zarr_path",
        "hrv_zarr_path", "topo_zarr_path", "pv_csv", "pv_metadata_csv",
        "gsp_csv",
    )

    def _pin_data_paths(cfg) -> None:
        """Resolve relative datamodule paths against the LAUNCH directory
        (the hydra to_absolute_path idiom) — sweep trials re-compose from
        YAML after the chdir into the run dir, so paths that came from the
        datamodule config (not CLI) would otherwise resolve there."""
        datamodule = cfg.get("datamodule") or {}
        for key in path_keys:
            value = datamodule.get(key)
            if value and "://" not in value and not os.path.isabs(value):
                datamodule[key] = os.path.join(launch_dir, value)

    # hydra-style output directory: compose resolved ${now:...} already.
    # Multirun lands in hydra.sweep.dir with per-trial hydra.sweep.subdir
    # subdirectories; single runs in hydra.run.dir (reference
    # ``configs/hydra/default.yaml:1-12`` semantics).
    hydra_cfg = config.get("hydra") or {}
    if multirun:
        run_dir = (hydra_cfg.get("sweep") or {}).get("dir") or (
            hydra_cfg.get("run") or {}
        ).get("dir")
    else:
        run_dir = (hydra_cfg.get("run") or {}).get("dir")
    if run_dir:
        # Pin relative data paths before changing directory — in the
        # composed config and in the raw overrides (sweep trials re-compose
        # from the overrides after the chdir).
        _pin_data_paths(config)
        for i, override in enumerate(overrides):
            for key in (f"datamodule.{name}=" for name in path_keys):
                if override.startswith(key):
                    value = override[len(key):]
                    if value and "://" not in value and not os.path.isabs(value):
                        overrides[i] = key + os.path.abspath(value)
        os.makedirs(run_dir, exist_ok=True)
        os.chdir(run_dir)

    extras(config)
    if config.get("print_config"):
        print_config(config)

    if multirun and config.get("sweep"):
        from predict_pv_yield_tpu.sweep import run_sweep

        def compose_fn(overrides):
            cfg = compose("config", overrides)
            _pin_data_paths(cfg)
            return cfg

        best_value, best_params, _ = run_sweep(compose_fn, overrides, config)
        print(f"sweep best value: {best_value} with {best_params}")
        return

    result = train(config)
    if result is not None:
        print(f"{config.get('optimized_metric')}: {result}")


if __name__ == "__main__":
    main()
