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

    # Checkpointable callback state (Lightning's ``state_dict`` /
    # ``load_state_dict`` callback hooks): saved in every checkpoint's
    # ``loop.json`` so resume restores early-stop patience, best-k
    # bookkeeping, etc. exactly (SURVEY §5.4; gate in tests/test_engine.py).
    def state_dict(self) -> Dict:
        return {}

    def load_state_dict(self, state: Dict) -> None:
        pass


def _save_state(path: str, state, loop: Optional[Dict] = None) -> None:
    """Persist a TrainState with orbax; fall back to flax msgpack bytes.

    ``loop`` (engine loop counters + callback states, ``Trainer.loop_state``)
    is written alongside as ``loop.json`` so resume is exact, not just
    parameter-restoring."""
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
    if loop is not None:
        with open(os.path.join(path, "loop.json"), "w") as fh:
            json.dump(loop, fh)


def load_loop_state(path: str) -> Optional[Dict]:
    """Read a checkpoint's ``loop.json`` (None for pre-loop checkpoints)."""
    loop_path = os.path.join(os.path.abspath(path), "loop.json")
    if not os.path.exists(loop_path):
        return None
    with open(loop_path) as fh:
        return json.load(fh)


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
    from jax.sharding import NamedSharding, PartitionSpec

    # The state's mesh (from any mesh-sharded leaf). A fresh TrainState's
    # optax scalars (e.g. the Adam step counter) sit UNCOMMITTED on the
    # default device — jit relocates them silently — but every restored
    # array is COMMITTED, so restoring a scalar to its single device while
    # params restore to the mesh would poison the next train step with a
    # mixed-device-set error. Restore such leaves replicated on the mesh.
    mesh = None
    for leaf in jax.tree.leaves(abstract_state):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding):
            mesh = sharding.mesh
            break

    def as_abstract(x):
        if hasattr(x, "shape"):
            sharding = getattr(x, "sharding", None)
            if not isinstance(sharding, NamedSharding):
                sharding = (
                    NamedSharding(mesh, PartitionSpec())
                    if mesh is not None
                    else None
                )
            # restore straight into the target's sharding (replicated params
            # AND tensor-parallel shards land where they belong)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
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

        # Best-k bookkeeping runs BEFORE the loop_state snapshot so the
        # loop.json written into `last` (and the new best checkpoint itself)
        # already lists this validation's save — otherwise a resume from
        # `last` restores best_k missing the checkpoint written alongside
        # it, re-saves a worse score as "best", and the test phase loads the
        # wrong weights.
        best_path = None
        if score is not None and not (
            isinstance(score, float) and math.isnan(score)
        ):
            score = float(score)
            if self.save_top_k and (
                len(self.best_k) < self.save_top_k
                or self._better(score, self.best_k[-1][0])
            ):
                name = self.filename.format(epoch=epoch)
                path = os.path.join(self.dirpath, name)
                # mid-epoch validation (val_check_interval) revisits the same
                # {epoch} filename within one epoch — version the collision
                # (Lightning's "-v1" rule) so a worse-but-qualifying later
                # save cannot overwrite a better checkpoint holding the name
                taken = {p for _, p in self.best_k}
                if path in taken:
                    version = 1
                    while f"{path}-v{version}" in taken:
                        version += 1
                    path = f"{path}-v{version}"
                self.best_k.append((score, path))
                self.best_k.sort(key=lambda sp: sp[0], reverse=self.mode != "min")
                while len(self.best_k) > self.save_top_k:
                    _, stale = self.best_k.pop()
                    if os.path.exists(stale):
                        shutil.rmtree(stale, ignore_errors=True)
                self.best_model_score, self.best_model_path = self.best_k[0]
                best_path = path

        loop = getattr(engine, "loop_state", lambda: None)()

        if self.save_last:
            _save_state(os.path.join(self.dirpath, "last"), engine.state, loop)

        if best_path is not None:
            _save_state(best_path, engine.state, loop)
            with open(os.path.join(best_path, "monitor.json"), "w") as fh:
                json.dump(
                    {"monitor": self.monitor, "score": score, "epoch": epoch}, fh
                )
            if self.verbose:
                log.info(
                    "checkpoint %s: %s=%.6f", best_path, self.monitor, score
                )

    def state_dict(self) -> Dict:
        return {
            "best_k": [[s, p] for s, p in self.best_k],
            "best_model_path": self.best_model_path,
            "best_model_score": self.best_model_score,
        }

    def load_state_dict(self, state: Dict) -> None:
        self.best_k = [(float(s), str(p)) for s, p in state.get("best_k", [])]
        self.best_model_path = state.get("best_model_path", "")
        self.best_model_score = state.get("best_model_score")


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

    def state_dict(self) -> Dict:
        return {"best": self.best, "wait": self.wait}

    def load_state_dict(self, state: Dict) -> None:
        self.best = state.get("best")
        self.wait = int(state.get("wait", 0))
