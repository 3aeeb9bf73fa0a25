"""Training callbacks: checkpointing and early stopping.

Native equivalents of the two callbacks the reference configures
(``configs/callbacks/default.yaml:1-17``): a ModelCheckpoint monitoring
``MSE/Validation_epoch`` (min, ``save_top_k=1``, ``save_last=True``, filename
``epoch_{epoch:03d}``) and an EarlyStopping with patience 5.

Checkpoints are written with orbax (SURVEY §5.4) — the TPU-native analog of
Lightning's ``.ckpt`` files: the full ``TrainState`` (params + optimiser
state + step) is saved, so resume restores optimisation exactly.
"""

from __future__ import annotations

import json
import logging
import math
import os
import shutil
from typing import Dict, Optional

log = logging.getLogger(__name__)


class Callback:
    """Engine lifecycle hooks. All default to no-ops."""

    def on_fit_start(self, engine, model) -> None: ...

    def on_train_epoch_end(self, engine, model, metrics: Dict[str, float]) -> None: ...

    def on_validation_epoch_end(self, engine, model, metrics: Dict[str, float]) -> None: ...

    def on_fit_end(self, engine, model) -> None: ...


def _save_state(path: str, state) -> None:
    """Persist a TrainState with orbax; fall back to flax msgpack bytes."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    try:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state)
    except Exception as exc:  # pragma: no cover - orbax is baked in
        log.warning("orbax save failed (%s); falling back to msgpack", exc)
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(state))


def load_state(path: str, abstract_state):
    """Restore a TrainState saved by :func:`_save_state`."""
    path = os.path.abspath(path)
    msgpack = os.path.join(path, "state.msgpack")
    if os.path.exists(msgpack):
        from flax import serialization

        with open(msgpack, "rb") as fh:
            return serialization.from_bytes(abstract_state, fh.read())
    import jax
    import orbax.checkpoint as ocp

    def as_abstract(x):
        if isinstance(x, jax.Array):
            # restore straight into the target's sharding (replicated params
            # AND tensor-parallel shards land where they belong)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "shape"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x

    abstract = jax.tree.map(as_abstract, abstract_state)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


class ModelCheckpoint(Callback):
    """Save best-k (by a monitored metric) and last checkpoints."""

    def __init__(
        self,
        monitor: str = "MSE/Validation_epoch",
        mode: str = "min",
        save_top_k: int = 1,
        save_last: bool = True,
        verbose: bool = False,
        dirpath: str = "checkpoints/",
        filename: str = "epoch_{epoch:03d}",
        auto_insert_metric_name: bool = False,
    ):
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.verbose = verbose
        self.dirpath = dirpath
        self.filename = filename
        self.auto_insert_metric_name = auto_insert_metric_name
        #: (score, path) of kept checkpoints, best first.
        self.best_k: list[tuple[float, str]] = []
        self.best_model_path: str = ""
        self.best_model_score: Optional[float] = None

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def on_validation_epoch_end(self, engine, model, metrics: Dict[str, float]) -> None:
        # Lightning disables checkpointing in fast_dev_run — dev smoke runs
        # must stay free of on-disk side effects
        if engine.sanity_checking or getattr(engine, "fast_dev_run", False):
            return
        score = metrics.get(self.monitor)
        epoch = engine.current_epoch
        os.makedirs(self.dirpath, exist_ok=True)

        if self.save_last:
            _save_state(os.path.join(self.dirpath, "last"), engine.state)

        if score is None or (isinstance(score, float) and math.isnan(score)):
            return
        score = float(score)

        if self.save_top_k and (
            len(self.best_k) < self.save_top_k
            or self._better(score, self.best_k[-1][0])
        ):
            name = self.filename.format(epoch=epoch)
            path = os.path.join(self.dirpath, name)
            # mid-epoch validation (val_check_interval) revisits the same
            # {epoch} filename within one epoch — version the collision
            # (Lightning's "-v1" rule) so a worse-but-qualifying later save
            # cannot overwrite a better checkpoint already holding the name
            taken = {p for _, p in self.best_k}
            if path in taken:
                version = 1
                while f"{path}-v{version}" in taken:
                    version += 1
                path = f"{path}-v{version}"
            _save_state(path, engine.state)
            with open(os.path.join(path, "monitor.json"), "w") as fh:
                json.dump({"monitor": self.monitor, "score": score, "epoch": epoch}, fh)
            self.best_k.append((score, path))
            self.best_k.sort(key=lambda sp: sp[0], reverse=self.mode != "min")
            while len(self.best_k) > self.save_top_k:
                _, stale = self.best_k.pop()
                if os.path.exists(stale):
                    shutil.rmtree(stale, ignore_errors=True)
            self.best_model_score, self.best_model_path = self.best_k[0]
            if self.verbose:
                log.info("checkpoint %s: %s=%.6f", path, self.monitor, score)


class EarlyStopping(Callback):
    """Stop after ``patience`` validation epochs without improvement
    (reference ``configs/callbacks/default.yaml:12-17``)."""

    def __init__(
        self,
        monitor: str = "MSE/Validation_epoch",
        mode: str = "min",
        patience: int = 5,
        min_delta: float = 0.0,
    ):
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_delta = abs(min_delta)
        self.best: Optional[float] = None
        self.wait = 0

    def on_validation_epoch_end(self, engine, model, metrics: Dict[str, float]) -> None:
        # Lightning disables early stopping in fast_dev_run too
        if engine.sanity_checking or getattr(engine, "fast_dev_run", False):
            return
        score = metrics.get(self.monitor)
        if score is None:
            return
        score = float(score)
        improved = self.best is None or (
            score < self.best - self.min_delta
            if self.mode == "min"
            else score > self.best + self.min_delta
        )
        if improved:
            self.best = score
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                log.info(
                    "early stopping: %s did not improve for %d epochs",
                    self.monitor,
                    self.patience,
                )
                engine.should_stop = True
