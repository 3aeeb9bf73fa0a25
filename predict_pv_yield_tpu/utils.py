"""Harness utilities.

Native equivalents of reference ``predict_pv_yield/utils.py``: model-config
loading (``utils.py:16-32``), rank-zero logging (``:35-46``), debug-mode
config rewriting (``:49-88``), config pretty-printing (``:91-129``),
hyperparameter + parameter-count logging (``:136-177``) and logger
finalisation (``:180-195``).
"""

from __future__ import annotations

import logging
import os
import warnings
from typing import Any, Dict, Optional, Sequence

import yaml

import predict_pv_yield_tpu
from predict_pv_yield_tpu.parallel.mesh import is_main_process


def enable_persistent_compile_cache() -> None:
    """Point jax at the shared on-disk XLA compile cache.

    ONE implementation for every entrypoint (``run.py``, ``bench.py``,
    ``__graft_entry__.py``, ``tests/conftest.py``,
    ``tests/mp_distributed_worker.py``) — the five inline copies had
    already diverged once (different ``min_compile_time`` floors, only one
    honouring the opt-out). Honours ``JAX_NO_PERSISTENT_CACHE=1`` and the
    ``JAX_COMPILATION_CACHE_DIR`` override; never raises (an exotic jax
    build without the option must not break an entrypoint).
    """
    if os.environ.get("JAX_NO_PERSISTENT_CACHE") == "1":
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/predict_pv_yield_tpu_xla_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def timed_device_compute(dispatch, runs: int):
    """Compute-only seconds for ``runs`` dispatches of ``dispatch`` (a
    zero-arg callable returning a device pytree), with the dev-rig sync
    protocol shared by ``bench.py`` and ``tools/flow_bench.py``.

    A full ``jax.device_get`` is the one reliable sync on remote-tunnel
    rigs (``block_until_ready`` can return before remote completion, and
    eager ops on still-queued buffers wedge the tunnel) — but it also
    ships the whole result through the ~35 MB/s link once per timed loop.
    That pure-transfer cost is measured by re-fetching the already-ready
    buffer (twice, keeping the MIN — link jitter inflates a single fetch
    and would over-subtract) and only compute is billed, the same quantity
    a CPU-farm baseline times.

    Returns ``(seconds, info)``. When the subtraction would remove >95% of
    the measured wall the point is link noise, not kernel time: ``seconds``
    is clamped to 5% of the wall (never the absurd rate a raw
    ``max(elapsed - fetch, 1e-9)`` denominator can produce) and
    ``info["transfer_dominated"]`` is True so callers flag or re-run it.
    """
    import time

    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(runs):
        out = dispatch()
    jax.device_get(out)
    elapsed = time.perf_counter() - t0
    fetch = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(out)
        fetch = min(fetch, time.perf_counter() - t0)
    compute = elapsed - fetch
    floor = 0.05 * elapsed
    dominated = compute < floor
    return max(compute, floor), {
        "elapsed": elapsed,
        "fetch": fetch,
        "transfer_dominated": dominated,
    }


def load_config(config_file: str) -> Dict[str, Any]:
    """Open a model YAML and strip the ``_target_`` key (reference
    ``utils.py:16-32``). Relative paths resolve against the repo root."""
    if not os.path.isabs(config_file) and not os.path.exists(config_file):
        package_dir = os.path.dirname(predict_pv_yield_tpu.__file__)
        config_file = os.path.join(package_dir, "..", config_file)
    with open(config_file, "r") as fh:
        config = yaml.safe_load(fh)
    config.pop("_target_", None)
    return config


def get_logger(name: str = __name__, level: int = logging.INFO) -> logging.Logger:
    """Multi-host-friendly logger: only process 0 emits (reference
    ``utils.py:35-46``)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not is_main_process():
        logger.addFilter(lambda record: False)
    return logger


def extras(config: Dict[str, Any]) -> None:
    """Debug-friendly config rewriting, in place (reference ``utils.py:49-88``):
    ``ignore_warnings`` silences Python warnings; ``debug=true`` forces
    ``trainer.fast_dev_run``; fast_dev_run zeroes out data-loader workers."""
    log = get_logger(__name__)

    if config.get("ignore_warnings"):
        log.info("Disabling python warnings! <config.ignore_warnings=True>")
        warnings.filterwarnings("ignore")

    if config.get("debug"):
        log.info("Running in debug mode! <config.debug=True>")
        config.setdefault("trainer", {})["fast_dev_run"] = True

    if config.get("trainer", {}).get("fast_dev_run"):
        log.info("Forcing debugger friendly configuration!")
        datamodule = config.get("datamodule", {})
        if datamodule.get("num_workers"):
            datamodule["num_workers"] = 0
        if datamodule.get("pin_memory"):
            datamodule["pin_memory"] = False


def print_config(
    config: Dict[str, Any],
    fields: Sequence[str] = ("trainer", "model", "datamodule", "callbacks", "logger", "seed"),
    resolve: bool = True,
) -> None:
    """Print the composed config as a tree and save ``config_tree.txt``
    (reference ``utils.py:91-129``). Uses rich when available."""
    if not is_main_process():
        return
    try:
        import rich
        import rich.syntax
        import rich.tree

        tree = rich.tree.Tree("CONFIG", style="dim", guide_style="dim")
        for field in fields:
            branch = tree.add(field, style="dim", guide_style="dim")
            section = config.get(field)
            text = yaml.dump(section) if isinstance(section, dict) else str(section)
            branch.add(rich.syntax.Syntax(text, "yaml"))
        rich.print(tree)
        with open("config_tree.txt", "w") as fh:
            rich.print(tree, file=fh)
    except ImportError:
        lines = ["CONFIG"]
        for field in fields:
            lines.append(f"├── {field}")
            section = config.get(field)
            text = yaml.dump(section) if isinstance(section, dict) else str(section)
            lines.extend(f"│   {line}" for line in text.splitlines())
        output = "\n".join(lines)
        print(output)
        with open("config_tree.txt", "w") as fh:
            fh.write(output)


def count_parameters(variables) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(variables))


def log_hyperparameters(
    config: Dict[str, Any],
    model,
    datamodule,
    trainer,
    callbacks=None,
    logger=None,
) -> None:
    """Send config sections + parameter counts to all loggers (reference
    ``utils.py:136-177``). All parameters are trainable in this framework —
    the non-trainable count is kept for schema parity."""
    if logger is None or not is_main_process():
        return
    hparams: Dict[str, Any] = {
        "trainer": config.get("trainer"),
        "model": config.get("model"),
        "datamodule": config.get("datamodule"),
    }
    if "seed" in config:
        hparams["seed"] = config["seed"]
    if "callbacks" in config:
        hparams["callbacks"] = config["callbacks"]

    # parameter counts are logged by engine.setup() once the state exists
    # (the pipeline calls this BEFORE fit, when trainer.state is still None
    # — matching the reference, where Lightning logs them at fit time)
    trainer.logger.log_hyperparams(hparams)


def finish(config=None, model=None, datamodule=None, trainer=None, callbacks=None, logger=None) -> None:
    """Close every logger cleanly (reference ``utils.py:180-195``)."""
    if trainer is not None:
        trainer.logger.finalize()
    elif logger is not None:
        for lg in logger if isinstance(logger, (list, tuple)) else [logger]:
            lg.finalize()
