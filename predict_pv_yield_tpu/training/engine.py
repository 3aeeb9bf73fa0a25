"""The training engine — a TPU-native replacement for the reference's
PyTorch-Lightning ``Trainer`` + ``BaseModel`` step logic.

Where the reference spreads training semantics across ``pl.Trainer`` and
``BaseModel._training_or_validation_step`` (reference ``base_model.py:78-146``,
``training.py:63-88``), this engine owns them once, for every model:

* **One jitted train step** per model: forward → NMAE loss (the reference's
  training loss, ``base_model.py:148-153``) → grads → Adam(lr=5e-4)
  (``base_model.py:255-257``), compiled as a single XLA program with the
  batch sharded over the mesh's ``data`` axis and parameters replicated.
  Gradient and metric reductions become XLA collectives automatically — the
  ``sync_dist=True`` analog (``base_model.py:108-119``) costs nothing extra.
* **Metrics** MSE / NMAE / MSE_EXP / MAE_EXP per step and per epoch, plus
  per-forecast-horizon MSE/MAE on validation/test (``base_model.py:121-141``;
  the reference's key collision where MAE overwrote MSE is fixed — both are
  emitted under distinct keys, values unchanged).
* **Validation results** de-normalised to MW via ``gsp_capacity`` and saved
  as per-epoch CSVs (``base_model.py:222-250``), when the model's forecast
  cadence matches the 30-minute GSP series.
* **Async metric collection**: device scalars are accumulated and fetched
  once per epoch, so the dispatch pipeline never stalls on host readbacks.
* **bf16 mixed precision** via module dtype (TPU-native: no loss scaling —
  reference ``precision=16`` AMP, SURVEY §2.6).

Trainer-config surface mirrors the reference's ``configs/trainer/*.yaml`` keys
so those configs port verbatim; unsupported Lightning knobs are accepted and
ignored with a debug log.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from functools import partial
from typing import Any, Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from predict_pv_yield_tpu.data.batch import Batch, as_batch
from predict_pv_yield_tpu.losses import WeightedLosses, mse_loss, nmae_loss
from predict_pv_yield_tpu.metrics import (
    mae_each_forecast_horizon,
    mse_each_forecast_horizon,
)
from predict_pv_yield_tpu.parallel.mesh import (
    batch_sharding,
    is_main_process,
    mesh_for_batch,
    replicated,
)
from predict_pv_yield_tpu.training.callbacks import Callback, ModelCheckpoint, load_state
from predict_pv_yield_tpu.training.loggers import Logger, LoggerCollection
from predict_pv_yield_tpu.validation import (
    make_validation_results,
    save_validation_results_to_logger,
)

log = logging.getLogger(__name__)


def _drop_first_batches(loader, k: int):
    """Iterate ``loader`` skipping its first ``k`` batches (mid-epoch
    resume fast-forward; deterministic loaders make this exact)."""
    it = iter(loader)
    for _ in range(k):
        if next(it, None) is None:
            return
    yield from it


def _as_logger_collection(logger) -> LoggerCollection:
    if logger is None:
        return LoggerCollection([])
    if isinstance(logger, LoggerCollection):
        return logger
    if isinstance(logger, (list, tuple)):
        return LoggerCollection(list(logger))
    return LoggerCollection([logger])


class _SimpleProfiler:
    """Per-phase wall-time aggregation — parity with Lightning's
    ``profiler='simple'`` report (reference ``configs/trainer/default.yaml:14``)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    class _Timer:
        def __init__(self, profiler, phase):
            self.profiler, self.phase = profiler, phase

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.profiler.totals[self.phase] += dt
            self.profiler.counts[self.phase] += 1

    def time(self, phase: str) -> "_SimpleProfiler._Timer":
        return self._Timer(self, phase)

    def summary(self) -> str:
        lines = ["Profiler report (phase | total s | calls | mean ms)"]
        for phase in sorted(self.totals, key=self.totals.get, reverse=True):
            total, count = self.totals[phase], self.counts[phase]
            lines.append(
                f"  {phase:<24} {total:10.3f} {count:8d} {1e3 * total / max(count, 1):10.2f}"
            )
        return "\n".join(lines)


class Trainer:
    """Generic training/validation/test engine for the model zoo."""

    def __init__(
        self,
        min_epochs: int = 1,
        max_epochs: int = 10,
        callbacks: Optional[List[Callback]] = None,
        logger=None,
        precision: Any = 32,
        fast_dev_run: bool = False,
        profiler: Optional[str] = "simple",
        resume_from_checkpoint: Optional[str] = None,
        accumulate_grad_batches: int = 1,
        gradient_clip_val: float = 0.0,
        max_steps: Optional[int] = None,
        min_steps: Optional[int] = None,
        check_val_every_n_epoch: int = 1,
        val_check_interval: Optional[float] = None,
        reload_dataloaders_every_epoch: bool = False,
        num_sanity_val_steps: int = 0,
        limit_train_batches: Optional[float] = None,
        limit_val_batches: Optional[float] = None,
        limit_test_batches: Optional[float] = None,
        overfit_batches: float = 0.0,
        track_grad_norm: float = -1,
        log_every_n_steps: int = 1,
        learning_rate: float = 5e-4,
        auto_lr_find: Union[bool, Dict[str, Any]] = False,
        weights_summary: Optional[str] = "top",
        devices: Optional[List] = None,
        terminate_on_nan: bool = False,
        debug_nans: bool = False,
        prefetch_depth: int = 2,
        steps_per_execution: int = 1,
        model_parallel: int = 1,
        seed: int = 0,
        save_validation_plots: bool = True,
        wire_float16: bool = False,
        **lightning_compat: Any,
    ):
        self.seed = seed
        self.save_validation_plots = save_validation_plots
        #: Cast float32 batch leaves to float16 on the host before transfer —
        #: halves host->HBM bytes (numpy f32->f16 is vectorized and cheap;
        #: models upcast on device). Useful when the link, not compute, is
        #: the bottleneck.
        self.wire_float16 = wire_float16
        self.min_epochs = min_epochs
        self.max_epochs = max_epochs
        # Checkpoint callbacks run LAST (Lightning's callback ordering): a
        # ModelCheckpoint snapshots every other callback's state_dict() into
        # the checkpoint's loop.json, so e.g. EarlyStopping must have seen
        # this validation's metrics before the save for resume to be exact.
        self.callbacks = sorted(
            list(callbacks or []),
            key=lambda cb: isinstance(cb, ModelCheckpoint),
        )
        self.logger = _as_logger_collection(logger)
        self.precision = precision
        self.fast_dev_run = bool(fast_dev_run)
        self.profiler = _SimpleProfiler() if profiler else None
        self.jax_trace = profiler == "jax"
        self.resume_from_checkpoint = resume_from_checkpoint
        self.accumulate_grad_batches = accumulate_grad_batches
        #: Lightning-parity knobs with real semantics here (the rest of the
        #: Lightning Trainer surface is accepted and ignored for config
        #: portability — see ``lightning_compat``).
        self.gradient_clip_val = float(gradient_clip_val)
        self.max_steps = max_steps if max_steps and max_steps > 0 else None
        #: early stopping (``should_stop``) is ignored until this many
        #: optimiser steps have run (Lightning ``min_steps``).
        self.min_steps = min_steps if min_steps and min_steps > 0 else None
        self.check_val_every_n_epoch = max(1, int(check_val_every_n_epoch))
        #: Lightning semantics: 1.0/None → validate at epoch end only; a
        #: fraction → also mid-epoch every ``int(len(loader)·f)`` train
        #: batches; an int → every N train batches.
        if isinstance(val_check_interval, float) and not (
            0.0 <= val_check_interval <= 1.0
        ):
            # Lightning raises too — a float 2.0 is NOT "every 2 batches",
            # and silently never validating would be worse
            raise ValueError(
                f"val_check_interval={val_check_interval}: a float must be "
                "an epoch fraction in [0, 1]; pass an int batch cadence"
            )
        self.val_check_interval = val_check_interval
        self.reload_dataloaders_every_epoch = bool(reload_dataloaders_every_epoch)
        self.num_sanity_val_steps = max(0, int(num_sanity_val_steps))
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        #: Lightning semantics: 0 disables; fraction of the epoch in (0, 1);
        #: an int >= 1 is a batch count. Batches are cached host-side and
        #: reused for train AND validation every epoch.
        self.overfit_batches = overfit_batches
        #: -1 disables; any p >= 0 logs the pre-update global p-norm of the
        #: gradients as ``grad_{p}_norm`` (computed inside the jitted step —
        #: free fusion, no extra host sync).
        self.track_grad_norm = float(track_grad_norm)
        self.log_every_n_steps = max(1, int(log_every_n_steps))
        self.learning_rate = learning_rate
        #: run the LR range finder before fitting and adopt its suggestion
        #: (Lightning ``auto_lr_find``); results land in
        #: :attr:`lr_find_results` for inspection/plotting. A dict enables it
        #: AND overrides :meth:`lr_find` keywords (e.g.
        #: ``auto_lr_find={"num_training": 20}``).
        self.auto_lr_find = bool(auto_lr_find)
        self._auto_lr_find_kwargs: Dict[str, Any] = (
            dict(auto_lr_find) if isinstance(auto_lr_find, dict) else {}
        )
        self.lr_find_results: Optional[Dict[str, Any]] = None
        #: ``"top"`` logs per-top-level-module parameter counts at setup,
        #: ``"full"`` every parameter array, ``None`` disables (Lightning
        #: ``weights_summary``).
        self.weights_summary = weights_summary
        self.devices = devices
        self.terminate_on_nan = terminate_on_nan
        self.prefetch_depth = prefetch_depth
        #: Train steps fused into one device dispatch via lax.scan —
        #: amortises host dispatch latency when single steps are tiny.
        self.steps_per_execution = max(1, int(steps_per_execution))
        #: Devices per replica on the mesh's ``model`` axis; >1 enables the
        #: tensor-parallel layout for modules with partitioned params.
        self.model_parallel = max(1, int(model_parallel))
        if lightning_compat:
            log.debug("ignoring Lightning-compat trainer args: %s", sorted(lightning_compat))
        if debug_nans:
            jax.config.update("jax_debug_nans", True)

        # run state
        self.current_epoch = 0
        self.global_step = 0
        self._last_val_step = -1  # global_step at the most recent mid-epoch val
        self._epoch_start_step = 0  # global_step when the current epoch began
        self._in_train_epoch = False  # True while inside _train_epoch (so a
        # mid-epoch checkpoint records its position for exact resume)
        self._fit_start_epoch = 0  # first epoch fit() runs (resume sets it)
        self._resume_skip_batches = 0  # batches of the resumed epoch already
        # trained before the checkpoint was written (mid-epoch resume)
        self.should_stop = False
        self.sanity_checking = False
        self._wire_cast_loaders: List = []  # loaders holding our transform
        self.state: Optional[TrainState] = None
        self.mesh = None
        self.callback_metrics: Dict[str, float] = {}
        self._model = None
        self._datamodule = None
        self._compiled: Dict[str, Any] = {}
        #: satellite channel list from the dataset configuration — drives the
        #: per-channel stats of the fused int16 decode.
        self._satellite_channels = None

    # ------------------------------------------------------------------
    @property
    def checkpoint_callback(self) -> Optional[ModelCheckpoint]:
        for cb in self.callbacks:
            if isinstance(cb, ModelCheckpoint):
                return cb
        return None

    @property
    def _bf16(self) -> bool:
        return str(self.precision) in ("16", "bf16", "16-mixed", "bf16-mixed")

    # ------------------------------------------------------------------
    def _adopt_configuration(self, source) -> None:
        """Thread the dataset configuration's channel selection into the
        fused preprocessing stage (wrong channel stats otherwise). ``source``
        is anything carrying a ``configuration`` attribute — a datamodule or
        a dataset/loader."""
        configuration = getattr(source, "configuration", None)
        if configuration is not None:
            self._satellite_channels = tuple(
                configuration.input_data.satellite.satellite_channels
            )

    def _resolve_loaders(self, datamodule, train_loader, val_loader):
        if datamodule is not None:
            self._adopt_configuration(datamodule)
            if train_loader is None and hasattr(datamodule, "train_dataloader"):
                train_loader = datamodule.train_dataloader()
            if val_loader is None and hasattr(datamodule, "val_dataloader"):
                val_loader = datamodule.val_dataloader()
        return train_loader, val_loader

    def _prepare_model(self, model):
        if self._bf16 and getattr(model, "dtype", None) is None:
            try:
                model = model.clone(dtype=jnp.bfloat16)
            except TypeError:
                log.debug("%s has no dtype field; running fp32", type(model).__name__)
        return model

    def _example_batch(self, loader) -> Batch:
        # Prefer side-effect-free access: a prefetching loader's underlying
        # map-style dataset, or direct indexing — iterating would consume an
        # epoch (shuffle counter, spawned worker threads) just for shapes.
        dataset = getattr(loader, "dataset", None)
        if dataset is not None and hasattr(dataset, "__getitem__"):
            return as_batch(dataset[0])
        if hasattr(loader, "__getitem__"):
            return as_batch(loader[0])
        iterator = iter(loader)
        try:
            return as_batch(next(iterator))
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:
                close()

    def _init_params(self, model, example):
        """Initialise parameters directly into their mesh shardings.

        Modules may box parameters with mesh-axis names
        (``nn.with_partitioning`` — e.g. the Perceiver's
        ``partition_attention`` tensor-parallel kernels); those shard over
        the mesh's ``model`` axis, everything else replicates. The returned
        tree is unboxed (plain arrays) — the partition metadata's only job
        is done once the arrays carry their NamedSharding."""
        from flax import linen as nn
        from jax.sharding import NamedSharding, PartitionSpec

        from predict_pv_yield_tpu.data.preprocess import preprocess_batch

        def init():
            # init must see what the train step's forward sees: the fused
            # preprocess (int16 decode, channel-last wire transpose) runs
            # inside the same traced program (abstract under eval_shape)
            decoded = preprocess_batch(
                example, channel_names=self._satellite_channels
            )
            return model.init(jax.random.key(self.seed), decoded)
        abstract = jax.eval_shape(init)
        specs = nn.get_partition_spec(abstract)
        shardings = jax.tree.map(
            lambda spec: NamedSharding(
                self.mesh, spec if isinstance(spec, PartitionSpec) else PartitionSpec()
            ),
            specs,
            is_leaf=lambda x: x is None or isinstance(x, PartitionSpec),
        )
        return jax.jit(
            lambda: nn.meta.unbox(init()), out_shardings=shardings
        )()

    def setup(self, model, example_batch: Batch, learning_rate=None) -> None:
        """Build mesh, init or restore parameters, construct the optimiser.

        ``learning_rate`` overrides the trainer's configured rate for this
        state only — a float or an optax schedule (the LR range finder
        passes its exponential sweep through here)."""
        model = self._prepare_model(model)
        self._model = model
        example = example_batch.numeric()
        # Loaders yield host-local batches; the mesh spans the global batch
        # (local × processes) so the data axis divides it exactly.
        global_batch_size = example.batch_size * jax.process_count()
        self.mesh = mesh_for_batch(
            global_batch_size, self.devices, model_parallel=self.model_parallel
        )
        self._batch_shard = batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        if self.wire_float16 == "auto":
            self.wire_float16 = self._resolve_wire_auto(example_batch)

        variables = self._init_params(model, example)
        from predict_pv_yield_tpu.utils import count_parameters

        n_params = count_parameters(variables)
        self.logger.log_hyperparams(
            {
                "model/params_total": n_params,
                "model/params_trainable": n_params,
                "model/params_not_trainable": 0,
            }
        )
        self._log_weights_summary(variables)

        # reference base_model.py:255-257 (Adam); a schedule is accepted for
        # the LR range finder's exponential sweep
        tx = optax.adam(
            self.learning_rate if learning_rate is None else learning_rate
        )
        if self.gradient_clip_val > 0:
            # Lightning clips the (accumulated) gradients by global norm
            # before the optimiser step; same order here.
            tx = optax.chain(
                optax.clip_by_global_norm(self.gradient_clip_val), tx
            )
        if self.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad_batches)
        self.state = TrainState.create(apply_fn=model.apply, params=variables, tx=tx)

        if self.resume_from_checkpoint:
            self.state = load_state(self.resume_from_checkpoint, self.state)
            self._restore_loop_state(self.resume_from_checkpoint)
            log.info("resumed from %s", self.resume_from_checkpoint)

        self._compiled = {
            "train": self._build_train_step(model),
            "eval": self._build_eval_step(model),
        }
        if self.steps_per_execution > 1:
            self._compiled["train_multi"] = self._build_multi_train_step(model)

    # ------------------------------------------------------------------
    def loop_state(self) -> Dict[str, Any]:
        """Loop counters + callback states for exact resume (saved as a
        checkpoint's ``loop.json``). The Lightning analog is the epoch /
        global_step / callback entries of a ``.ckpt``; first-party gate:
        tests/test_engine.py resume-exactness tests."""
        return {
            "epoch": self.current_epoch,
            "global_step": self.global_step,
            "epoch_start_step": self._epoch_start_step,
            # True when the checkpoint was written by a mid-epoch validation
            # (val_check_interval) — resume then re-enters the SAME epoch and
            # skips the batches already trained, instead of moving on
            "mid_epoch": self._in_train_epoch,
            "last_val_step": self._last_val_step,
            # duck-typed callbacks (anything with the hook methods works)
            # may not subclass Callback — treat them as stateless
            "callbacks": [
                {
                    "class": type(cb).__name__,
                    "state": cb.state_dict() if hasattr(cb, "state_dict") else {},
                }
                for cb in self.callbacks
            ],
        }

    def _restore_loop_state(self, checkpoint_path: str) -> None:
        """Apply a checkpoint's ``loop.json`` so training continues exactly
        where it stopped. Checkpoints without one (foreign/converted) keep
        the old params-only resume semantics."""
        from predict_pv_yield_tpu.training.callbacks import load_loop_state

        loop = load_loop_state(checkpoint_path)
        if loop is None:
            return
        self.current_epoch = int(loop["epoch"])
        self.global_step = int(loop["global_step"])
        self._last_val_step = int(loop.get("last_val_step", -1))
        if loop.get("mid_epoch"):
            self._fit_start_epoch = self.current_epoch
            self._resume_skip_batches = self.global_step - int(
                loop.get("epoch_start_step", self.global_step)
            )
        else:
            self._fit_start_epoch = self.current_epoch + 1
            self._resume_skip_batches = 0
        saved = loop.get("callbacks", [])
        for cb, entry in zip(self.callbacks, saved):
            if type(cb).__name__ == entry.get("class") and hasattr(
                cb, "load_state_dict"
            ):
                cb.load_state_dict(entry.get("state", {}))
            else:  # pragma: no cover - config changed between save and resume
                log.warning(
                    "resume: callback %s does not match saved %s; skipping",
                    type(cb).__name__, entry.get("class"),
                )

    def _log_weights_summary(self, variables) -> None:
        """Per-module parameter-count table at setup (Lightning
        ``weights_summary``: ``"top"`` aggregates per top-level module,
        ``"full"`` lists every array)."""
        if not self.weights_summary or not is_main_process():
            return
        from flax import traverse_util

        params = variables.get("params", variables)
        rows: List[tuple] = []
        if self.weights_summary == "full":
            for path, leaf in traverse_util.flatten_dict(params).items():
                rows.append(("/".join(map(str, path)), leaf.size))
        else:
            for name, sub in params.items():
                rows.append(
                    (str(name),
                     sum(x.size for x in jax.tree_util.tree_leaves(sub)))
                )
        if not rows:
            return
        width = max(len(name) for name, _ in rows)
        lines = [f"  {name:<{width}}  {count:>12,}" for name, count in rows]
        total = sum(count for _, count in rows)
        lines.append(f"  {'TOTAL':<{width}}  {total:>12,}")
        log.info("weights summary (%s):\n%s", self.weights_summary,
                 "\n".join(lines))

    # ------------------------------------------------------------------
    def _forward_and_metrics(self, model, variables, batch: Batch):
        # Fused on-device preprocessing: raw int16 satellite shards decode +
        # normalise inside the same XLA program as the step (no-op for
        # already-float data). The int16 ships over the host-device link;
        # widening happens in HBM (data/preprocess.py).
        from predict_pv_yield_tpu.data.preprocess import preprocess_batch

        batch = preprocess_batch(batch, channel_names=self._satellite_channels)
        weighted = WeightedLosses(forecast_length=model.forecast_len)
        y_hat = model.apply(variables, batch).astype(jnp.float32)
        y = model.target(batch).astype(jnp.float32)
        metrics = {
            "MSE": mse_loss(y_hat, y),
            "NMAE": nmae_loss(y_hat, y),
            "MSE_EXP": weighted.get_mse_exp(y_hat, y),
            "MAE_EXP": weighted.get_mae_exp(y_hat, y),
        }
        return y_hat, y, metrics

    def _train_step_body(self, model, state: TrainState, batch: Batch):
        def loss_fn(variables):
            _, _, metrics = self._forward_and_metrics(model, variables, batch)
            # The reference's training loss is NMAE (base_model.py:148-153).
            return metrics["NMAE"], metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        p = self.track_grad_norm
        if p >= 0:
            # Lightning's track_grad_norm logs the global p-norm of the raw
            # gradients before the optimiser step, keyed like
            # ``grad_2.0_norm_total``. Computed inside the jitted step — XLA
            # fuses it into the backward pass, no extra host sync.
            leaves = jax.tree_util.tree_leaves(grads)
            if p == 2.0:
                norm = optax.global_norm(grads)
            elif np.isinf(p):
                norm = jnp.max(
                    jnp.stack([jnp.max(jnp.abs(x)) for x in leaves])
                )
            elif p == 0.0:
                norm = sum(jnp.sum(x != 0) for x in leaves).astype(jnp.float32)
            else:
                norm = jnp.power(
                    sum(jnp.sum(jnp.abs(x) ** p) for x in leaves), 1.0 / p
                )
            metrics[f"grad_{p}_norm_total"] = norm
        return state.apply_gradients(grads=grads), metrics

    def _build_train_step(self, model):
        return jax.jit(
            lambda state, batch: self._train_step_body(model, state, batch),
            donate_argnums=0,
        )

    def _build_multi_train_step(self, model):
        """``steps_per_execution`` train steps in ONE device dispatch.

        ``batches`` is a Batch pytree with a leading (k, ...) axis; a
        ``lax.scan`` applies the train step per slice — the program stays
        O(1) in k and one dispatch amortises the host launch latency over k
        optimiser updates (the b32 single-step path measured
        dispatch-latency-bound on the v5e: near-flat step time from b32 to
        b128). Returns stacked (k,) per-step metrics."""

        def multi(state: TrainState, batches: Batch):
            return jax.lax.scan(
                lambda s, b: self._train_step_body(model, s, b), state, batches
            )

        return jax.jit(multi, donate_argnums=(0, 1))

    def _build_eval_step(self, model):
        def step(state: TrainState, batch: Batch):
            y_hat, y, metrics = self._forward_and_metrics(model, state.params, batch)
            horizon_mse = mse_each_forecast_horizon(y_hat, y)
            horizon_mae = mae_each_forecast_horizon(y_hat, y)
            return metrics, horizon_mse, horizon_mae, y_hat

        return jax.jit(step)

    # ------------------------------------------------------------------
    def _time_phase(self, phase: str):
        """Profiler timer for ``phase``, or a no-op context without one."""
        if self.profiler:
            return self.profiler.time(phase)
        import contextlib

        return contextlib.nullcontext()

    def _resolve_limit(self, limit, loader) -> Optional[int]:
        """Lightning batch-limit semantics: ``None``/``1.0`` → full epoch; an
        int ≥ 1 → batch count; a float in [0, 1) → fraction of
        ``len(loader)`` (0.0 → zero batches). A fraction other than 1.0
        requires a sized loader — same constraint Lightning places on
        iterable datasets."""
        if limit is None:
            return None
        if isinstance(limit, float) and 0.0 <= limit <= 1.0:
            if limit == 1.0:
                return None
            try:
                n = len(loader)
            except TypeError:
                raise ValueError(
                    f"fractional batch limit {limit} needs a sized loader; "
                    "pass an int batch count for length-less loaders"
                )
            return int(n * limit)
        return int(limit)

    def _iter_batches(self, loader, limit: Optional[int]):
        """Host iterator → device iterator with transfer/compute overlap.

        Keeps ``prefetch_depth`` batches in flight: ``device_put`` is async,
        so the next batch's host→HBM copy rides under the current step's
        compute — the double-buffering analog of the reference's
        ``pin_memory`` + ``prefetch_factor`` DataLoader settings
        (reference ``dataloader.py:82-91``).
        """
        from collections import deque

        queue: deque = deque()
        iterator: Optional[Iterable] = iter(loader)
        effective_limit = 1 if self.fast_dev_run else limit
        planned = 0  # batches pulled from the loader — never exceeds the
        # limit, so no batch is decoded + transferred only to be discarded
        count = 0
        while True:
            while iterator is not None and len(queue) < self.prefetch_depth:
                if effective_limit is not None and planned >= effective_limit:
                    iterator = None
                    break
                try:
                    # times how long the training loop WAITS on the host
                    # pipeline (the host >= device gate's observable)
                    with self._time_phase("loader_next"):
                        host = as_batch(next(iterator))
                except StopIteration:
                    iterator = None
                    break
                planned += 1
                queue.append((host, self._to_device(host)))
            if not queue:
                return
            yield queue.popleft()
            count += 1
            if effective_limit is not None and count >= effective_limit:
                return

    def _iter_batch_groups(self, loader, limit: Optional[int]):
        """Like ``_iter_batches`` but yields stacked groups of
        ``steps_per_execution`` host batches transferred as one (k, B, ...)
        device pytree. ``prefetch_depth`` stays denominated in BATCHES: the
        in-flight group count is ceil(depth / k), so turning on fused
        dispatch does not multiply resident host+HBM batch memory by k. A
        final short group (or a ``limit`` that is not a multiple of k) falls
        back to per-batch transfer and is yielded as
        (hosts, device, is_group=False) items."""
        from collections import deque

        k = self.steps_per_execution
        group_depth = max(1, -(-self.prefetch_depth // k))
        queue: deque = deque()
        iterator: Optional[Iterable] = iter(loader)
        pending: List[Batch] = []
        planned = 0  # batches pulled from the loader (respects ``limit`` exactly)
        count = 0
        while True:
            while iterator is not None and len(queue) < group_depth:
                exhausted = limit is not None and planned >= limit
                if not exhausted:
                    try:
                        with self._time_phase("loader_next"):
                            pending.append(as_batch(next(iterator)))
                        planned += 1
                    except StopIteration:
                        exhausted = True
                if exhausted:
                    iterator = None
                    for host in pending:  # leftover short group: single steps
                        queue.append(([host], self._to_device(host), False))
                    pending = []
                    break
                if len(pending) == k:
                    queue.append((pending, self._to_device_stacked(pending), True))
                    pending = []
            if not queue:
                return
            hosts, device, is_group = queue.popleft()
            yield hosts, device, is_group
            count += len(hosts)
            if limit is not None and count >= limit:
                return
            if self.fast_dev_run and count >= 1:
                return

    #: field names excluded from the f16 wire: OSGB eastings/northings are
    #: ~1e5-1e6, beyond float16's 65504 max — narrowing them shipped inf to
    #: any coordinate-consuming model (caught as a RuntimeWarning in the
    #: round-4 zarr-stream bench). The skip is by NAME, not by value, so
    #: leaf dtypes stay stable across batches (no jit recompiles).
    _WIRE_F16_SKIP = frozenset(
        {"x", "y", "pv_location_x", "pv_location_y", "gsp_x", "gsp_y"}
    )

    def _wire_cast(self, numeric):
        """Optional f32→f16 narrowing of host leaves before transfer
        (``wire_float16``); models upcast on device. Idempotent: leaves a
        loader-side pre-cast batch (``_offload_wire_cast``) untouched."""
        if not self.wire_float16:
            return numeric
        return self._wire_cast_tree(numeric)

    def _wire_cast_tree(self, numeric):
        import jax.tree_util as jtu

        def cast(path, leaf):
            if not (isinstance(leaf, np.ndarray) and leaf.dtype == np.float32):
                return leaf
            last = path[-1]
            name = getattr(last, "name", None) or str(last)
            if name in self._WIRE_F16_SKIP:
                return leaf
            return leaf.astype(np.float16)

        return jtu.tree_map_with_path(cast, numeric)

    def _resolve_wire_auto(self, example: Batch) -> bool:
        """Measured auto-selection for ``wire_float16="auto"``: ship the
        example batch both ways and keep the f16 wire only when cast +
        half-width transfer actually beats the plain f32 transfer. The
        f32→f16 cast costs host CPU; on a few-core host it can exceed the
        halved-transfer win (BENCH_r04 measured 25.0 vs 35.4 host batches/s)
        — so the choice is probed on THIS rig, not assumed."""
        if jax.process_count() > 1:
            # the probe's plain device_put doesn't model the multi-host
            # assembly path; be conservative rather than mis-measure
            return False
        numeric = example.numeric()

        # Sync by device_get of a data-dependent scalar, not
        # block_until_ready: on remote-tunnel rigs block_until_ready can
        # return before the transfer actually completes (the bench's
        # documented dev-rig behavior), which would turn this measured
        # decision into noise on exactly the bandwidth-starved hosts the
        # auto mode exists for. A jitted sum over every leaf consumes all
        # shipped bytes, so fetching its scalar forces the full transfer;
        # the sum's compute time is negligible against it and identical
        # for both variants.
        @jax.jit
        def _consume(tree):
            leaves = [
                jnp.sum(jnp.abs(x).astype(jnp.float32))
                for x in jax.tree.leaves(tree)
            ]
            return jnp.stack(leaves).sum()

        def ship(prep):
            best = float("inf")
            # first call compiles _consume for this dtype tree — warm, then
            # time two runs and keep the faster
            jax.device_get(_consume(jax.device_put(prep(), self._batch_shard)))
            for _ in range(2):
                t0 = time.perf_counter()
                jax.device_get(
                    _consume(jax.device_put(prep(), self._batch_shard))
                )
                best = min(best, time.perf_counter() - t0)
            return best

        t_f32 = ship(lambda: numeric)
        t_f16 = ship(lambda: self._wire_cast_tree(numeric))
        keep = t_f16 < t_f32
        log.info(
            "wire_float16=auto: f32 ship %.1f ms vs f16 cast+ship %.1f ms "
            "-> f16 wire %s", t_f32 * 1e3, t_f16 * 1e3, "ON" if keep else "OFF",
        )
        return keep

    def _offload_wire_cast(self, *loaders) -> None:
        """Move the f16 wire cast into ``PrefetchingLoader`` worker threads.

        On the consumer thread the cast serialises with everything else; in
        the loader workers it parallelises and overlaps the train loop (the
        reference's pin-memory DataLoader did its cast in workers the same
        way). ``_wire_cast`` in ``_to_device`` then no-ops on the already-f16
        leaves. Installed per-phase from THIS trainer's wire config and
        uninstalled by ``_remove_wire_cast`` when the phase ends — the
        closure pins the trainer (and its device-resident state) alive and
        would silently f16-narrow batches for any later non-engine consumer
        of the user-owned loader. An engine-installed transform on a reused
        loader is replaced; a user-owned transform is left alone."""
        for loader in loaders:
            if loader is None or not hasattr(loader, "transform"):
                continue
            current = loader.transform
            if current is not None and not getattr(
                current, "_engine_wire_cast", False
            ):
                continue
            if self.wire_float16:
                def cast_batch(batch, _self=self):
                    return _self._wire_cast_tree(batch)

                cast_batch._engine_wire_cast = True
                loader.transform = cast_batch
                self._wire_cast_loaders.append(loader)
            else:
                loader.transform = None

    def _remove_wire_cast(self) -> None:
        """Uninstall every engine-installed wire-cast transform (phase
        teardown counterpart of ``_offload_wire_cast``; user-owned
        transforms are never touched)."""
        for loader in self._wire_cast_loaders:
            if getattr(
                getattr(loader, "transform", None), "_engine_wire_cast", False
            ):
                loader.transform = None
        self._wire_cast_loaders = []

    def _to_device_stacked(self, hosts: List[Batch]):
        """k host batches → one (k, B, ...) device pytree, batch axis sharded
        over ``data`` and the scan axis replicated (P(None, 'data'))."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        numeric = [
            self._wire_cast(self._maybe_cast(h.numeric())) for h in hosts
        ]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *numeric)
        sharding = NamedSharding(self.mesh, P(None, "data"))
        if jax.process_count() > 1:
            from predict_pv_yield_tpu.parallel.distributed import (
                global_batch_from_host_local,
            )

            return global_batch_from_host_local(stacked, sharding, batch_axis=1)
        return jax.device_put(stacked, sharding)

    def _to_device(self, host: Batch):
        """Host batch → device batch sharded over the data axis.

        Single-process: one async ``device_put`` per leaf. Multi-host: each
        process holds its local slice of the global batch and the global
        sharded arrays are assembled without cross-host transfer
        (``parallel/distributed.py``, SURVEY §5.8)."""
        numeric = self._wire_cast(self._maybe_cast(host.numeric()))
        if jax.process_count() > 1:
            from predict_pv_yield_tpu.parallel.distributed import (
                global_batch_from_host_local,
            )

            return global_batch_from_host_local(numeric, self._batch_shard)
        return jax.device_put(numeric, self._batch_shard)

    def _maybe_cast(self, batch: Batch) -> Batch:
        """bf16-cast float leaves — device arrays only.

        Host numpy must NOT be cast here: numpy→ml_dtypes bfloat16 is a slow
        scalar loop (~0.5 s per 34 MB batch — measured as the end-to-end
        pipeline bottleneck). Mixed precision on the host path comes from the
        module dtype instead: flax casts inputs to bf16 on device, so float32
        leaves ship as-is and narrow inside the step."""
        if not self._bf16:
            return batch
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32
            else x,
            batch,
        )

    # ------------------------------------------------------------------
    def lr_find(
        self,
        model,
        datamodule=None,
        train_dataloaders=None,
        *,
        min_lr: float = 1e-8,
        max_lr: float = 1.0,
        num_training: int = 100,
        early_stop_threshold: float = 4.0,
    ) -> float:
        """LR range test (Lightning ``auto_lr_find`` / ``tuner.lr_find``).

        Runs up to ``num_training`` real train steps while the learning rate
        sweeps exponentially ``min_lr → max_lr`` — the sweep is an optax
        *schedule*, so the ordinary compiled train step is reused unchanged
        (one compile, no per-step optimiser surgery). The loss curve is
        EMA-smoothed (β=0.98, the fastai/Lightning rule) with early stop once
        it exceeds ``early_stop_threshold ×`` the best seen; the suggestion
        is the LR at the steepest descent of the smoothed curve. Results
        (lr/loss series + suggestion) land in :attr:`lr_find_results`; the
        sweep state is discarded so the next ``fit`` starts fresh.
        """
        train_loader, _ = self._resolve_loaders(
            datamodule, train_dataloaders, None
        )
        if train_loader is None:
            raise ValueError("lr_find() needs a datamodule or train_dataloaders")
        ratio = max_lr / min_lr
        # optax.MultiSteps advances the optimiser count once per
        # accumulate_grad_batches micro-batches — sweep in UPDATE units so
        # the recorded lr matches the lr actually applied
        k = max(1, int(self.accumulate_grad_batches))
        span = max(-(-num_training // k) - 1, 1)

        def schedule(count):
            frac = jnp.minimum(count, span) / span
            return min_lr * ratio ** frac

        self.setup(
            model, self._example_batch(train_loader), learning_rate=schedule
        )
        step_fn = self._compiled["train"]

        lrs: List[float] = []
        losses: List[float] = []
        beta = 0.98
        smoothed, best = 0.0, float("inf")
        step, diverged = 0, False
        while step < num_training and not diverged:
            advanced = False
            for _, device_batch in self._iter_batches(train_loader, None):
                advanced = True
                self.state, metrics = step_fn(self.state, device_batch)
                loss = float(jax.device_get(metrics["NMAE"]))
                if not np.isfinite(loss):
                    diverged = True
                    break
                smoothed = beta * smoothed + (1.0 - beta) * loss
                corrected = smoothed / (1.0 - beta ** (step + 1))
                lrs.append(
                    float(min_lr * ratio ** (min(step // k, span) / span))
                )
                losses.append(corrected)
                step += 1
                if corrected > early_stop_threshold * best:
                    diverged = True
                    break
                best = min(best, corrected)
                if step >= num_training:
                    break
            if not advanced:
                raise ValueError("lr_find() got an empty train loader")

        if not losses:
            raise ValueError(
                "lr_find diverged on the very first step (non-finite loss "
                f"at min_lr={min_lr:g}) — check the data and model init"
            )
        if len(losses) >= 3:
            # steepest descent of the smoothed curve; skip the noisy head
            # (≤10 points) and the divergence tail point
            grad = np.gradient(np.asarray(losses))
            lo = min(10, len(grad) - 2)
            idx = int(np.argmin(grad[lo: len(grad) - 1])) + lo
        else:
            idx = int(np.argmin(losses))
        suggestion = float(lrs[idx])
        self.lr_find_results = {
            "lr": lrs, "loss": losses, "suggestion": suggestion
        }
        # drop the sweep state: the next fit() builds fresh
        self.state = None
        self._compiled = {}
        self.global_step = 0
        self._last_val_step = -1
        return suggestion

    def tune(
        self, model, datamodule=None, train_dataloaders=None, **lr_find_kwargs
    ) -> Dict[str, Any]:
        """Lightning ``trainer.tune()``: run the enabled tuners.

        Only the LR finder exists — ``auto_scale_batch_size`` is meaningless
        here because the dataset contract yields whole pre-built batches
        (reference ``dataloader.py:82-91``: ``batch_size=None`` DataLoader).
        Adopts the suggestion into :attr:`learning_rate` like Lightning does.
        """
        out: Dict[str, Any] = {}
        if self.auto_lr_find:
            self.learning_rate = self.lr_find(
                model, datamodule, train_dataloaders,
                **{**self._auto_lr_find_kwargs, **lr_find_kwargs},
            )
            out["lr_find"] = self.lr_find_results
        return out

    # ------------------------------------------------------------------
    def fit(self, model, datamodule=None, train_dataloaders=None, val_dataloaders=None):
        """Full training loop (reference ``trainer.fit``, ``training.py:83``)."""
        train_loader, val_loader = self._resolve_loaders(
            datamodule, train_dataloaders, val_dataloaders
        )
        if train_loader is None:
            raise ValueError("fit() needs a datamodule or train_dataloaders")
        self._datamodule = datamodule

        if (
            self.auto_lr_find
            and not self.fast_dev_run  # Lightning skips tuners in dev runs
            and self.state is None
            and self.lr_find_results is None  # tune() may have run already
        ):
            self.learning_rate = self.lr_find(
                model, train_dataloaders=train_loader,
                **self._auto_lr_find_kwargs,
            )
            log.info(
                "auto_lr_find: adopting learning_rate=%.3e", self.learning_rate
            )

        if self.overfit_batches:
            train_loader, val_loader = self._overfit_loaders(train_loader)

        if self.state is None:
            self.setup(model, self._example_batch(train_loader))
        model = self._model

        if self.jax_trace and is_main_process():
            jax.profiler.start_trace("jax_trace")

        for cb in self.callbacks:
            cb.on_fit_start(self, model)

        if (
            self.num_sanity_val_steps
            and val_loader is not None
            and not self.fast_dev_run
        ):
            self._sanity_check(val_loader)

        max_epochs = 1 if self.fast_dev_run else self.max_epochs
        self._offload_wire_cast(train_loader, val_loader)
        try:
            # resume continues from the checkpointed epoch (loop.json);
            # a fresh fit starts at 0
            for epoch in range(self._fit_start_epoch, max_epochs):
                self.current_epoch = epoch
                if (
                    self.reload_dataloaders_every_epoch
                    and epoch > 0
                    and datamodule is not None
                    and not self.overfit_batches
                ):
                    # refresh only the loaders that CAME from the datamodule
                    # — an explicitly passed dataloader is the caller's to
                    # manage (Lightning reloads per-source too)
                    train_loader, val_loader = self._resolve_loaders(
                        datamodule, train_dataloaders, val_dataloaders
                    )
                # Pin the shuffle permutation to the GLOBAL epoch number:
                # without this a resumed run's fresh loader (or a reloaded
                # per-epoch loader) restarts its internal epoch counter at 0
                # and mid-epoch resume would fast-forward through the wrong
                # permutation, silently training some batches twice and
                # others never (resume-exactness gate in tests/test_engine).
                if hasattr(train_loader, "set_epoch"):
                    train_loader.set_epoch(epoch)
                train_metrics = self._train_epoch(train_loader, val_loader)
                for cb in self.callbacks:
                    cb.on_train_epoch_end(self, model, train_metrics)

                run_val = (
                    val_loader is not None
                    and (epoch + 1) % self.check_val_every_n_epoch == 0
                    # a mid-epoch val that landed exactly on the last train
                    # batch already covered the epoch boundary
                    and self._last_val_step != self.global_step
                )
                if run_val:
                    val_metrics = self._eval_epoch(model, val_loader, tag="Validation")
                    for cb in self.callbacks:
                        cb.on_validation_epoch_end(self, model, val_metrics)

                if self.terminate_on_nan and not np.isfinite(
                    train_metrics.get("NMAE/Train_epoch", 0.0)
                ):
                    log.error("non-finite training loss; stopping")
                    break
                if self.max_steps and self.global_step >= self.max_steps:
                    log.info("max_steps %d reached", self.max_steps)
                    break
                if self.should_stop and self._early_stop_ok():
                    break
        finally:
            self._remove_wire_cast()
            if self.jax_trace and is_main_process():
                jax.profiler.stop_trace()

        for cb in self.callbacks:
            cb.on_fit_end(self, model)
        # non-terminal flush: finalize() ends SaaS runs for good (wandb
        # rejects logging after finish), and a test phase may follow —
        # the pipeline's finish() owns the terminal call
        self.logger.save()
        if self.profiler is not None and is_main_process():
            log.info("%s", self.profiler.summary())
        return self.callback_metrics

    def _overfit_loaders(self, train_loader):
        """``overfit_batches`` (Lightning): pin the first N train batches
        host-side and use them — identical, unshuffled — as BOTH the train
        and the validation set every epoch. The canonical
        can-the-model-memorise debugging mode."""
        n = self._resolve_limit(
            float(self.overfit_batches)
            if isinstance(self.overfit_batches, float)
            else int(self.overfit_batches),
            train_loader,
        )
        cached: List[Batch] = []
        iterator = iter(train_loader)
        try:
            while n is None or len(cached) < n:
                try:
                    cached.append(as_batch(next(iterator)))
                except StopIteration:
                    break
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:
                close()
        if not cached:
            raise ValueError("overfit_batches: train loader yielded no batches")
        log.info(
            "overfit_batches=%s: training AND validating on the same %d "
            "cached batch(es)", self.overfit_batches, len(cached),
        )
        return cached, cached

    def _sanity_check(self, loader) -> None:
        """Run ``num_sanity_val_steps`` eval steps before training starts —
        shape/NaN problems surface in seconds instead of after the first
        train epoch (Lightning's sanity check; metrics are discarded)."""
        self.sanity_checking = True
        try:
            step_fn = self._compiled["eval"]
            metrics = None
            for _, device_batch in self._iter_batches(
                loader, self.num_sanity_val_steps
            ):
                metrics, *_ = step_fn(self.state, device_batch)
            if metrics is not None:
                jax.device_get(metrics)
        finally:
            self.sanity_checking = False

    def _early_stop_ok(self) -> bool:
        """The min_epochs/min_steps floors that gate a ``should_stop``."""
        return (
            self.current_epoch + 1 >= self.min_epochs
            and (self.min_steps is None or self.global_step >= self.min_steps)
        )

    def _maybe_midepoch_val(
        self, val_every: Optional[int], prev_done: int, batches_done: int, val_loader
    ):
        """Run a full validation pass when the train-batch count crosses a
        ``val_check_interval`` boundary (Lightning's mid-epoch validation;
        callbacks fire so checkpoint monitors see the metrics). Bucket
        comparison, not modulo — fused dispatch advances k batches at a time
        and must not stride over a boundary."""
        if not val_every or prev_done // val_every == batches_done // val_every:
            return
        metrics = self._eval_epoch(self._model, val_loader, tag="Validation")
        for cb in self.callbacks:
            cb.on_validation_epoch_end(self, self._model, metrics)
        self._last_val_step = self.global_step

    def _train_epoch(self, loader, val_loader=None) -> Dict[str, float]:
        try:
            self._in_train_epoch = True
            return self._train_epoch_inner(loader, val_loader)
        finally:
            self._in_train_epoch = False

    def _train_epoch_inner(self, loader, val_loader=None) -> Dict[str, float]:
        step_fn = self._compiled["train"]
        device_metrics: List[Dict] = []
        # Mid-epoch resume: the first epoch after restore re-enters the
        # interrupted epoch and skips the batches already trained (exact for
        # deterministic loaders; gate in tests/test_engine.py). One-shot.
        skip = self._resume_skip_batches
        self._resume_skip_batches = 0
        self._epoch_start_step = self.global_step - skip
        limit = self._resolve_limit(self.limit_train_batches, loader)
        # Fractional val_check_interval derives its cadence from THIS — the
        # limit_train_batches-truncated epoch length (Lightning's
        # num_training_batches). Neither a max_steps truncation nor a
        # mid-epoch resume skip may change where validations land, or an
        # interrupted run stops being a prefix of the uninterrupted one and
        # exact resume is impossible.
        full_epoch_limit = limit
        if skip and limit is not None:
            # limit_train_batches bounds the WHOLE epoch — already-trained
            # batches count against it
            limit = max(limit - skip, 0)
        if self.max_steps is not None:
            remaining = self.max_steps - self.global_step
            if remaining <= 0:
                return {}
            # exact in both modes: _iter_batch_groups pulls at most `limit`
            # batches from the loader and yields the remainder ungrouped
            limit = remaining if limit is None else min(limit, remaining)

        val_every = None
        if (
            val_loader is not None
            and self.val_check_interval is not None
            # check_val_every_n_epoch gates ALL validation, mid-epoch
            # included (Lightning composes the two knobs this way)
            and (self.current_epoch + 1) % self.check_val_every_n_epoch == 0
        ):
            vi = self.val_check_interval
            if isinstance(vi, float):
                # fraction of the limit_train_batches-truncated epoch (see
                # full_epoch_limit above) — not of the raw loader length,
                # and NOT of the max_steps- or resume-skip-reduced remainder
                try:
                    n = (
                        full_epoch_limit
                        if full_epoch_limit is not None
                        else len(loader)
                    )
                except TypeError:
                    raise ValueError(
                        f"fractional val_check_interval {vi} needs a sized "
                        "loader; pass an int batch cadence instead"
                    )
                val_every = max(1, int(n * vi)) if vi < 1.0 else None
            else:
                val_every = int(vi)

        if skip:
            loader = _drop_first_batches(loader, skip)
        # start the counter at the resume position so int val_check_interval
        # bucket boundaries land exactly where the uninterrupted run's would
        batches_done = skip
        if self.steps_per_execution > 1 and not self.fast_dev_run:
            multi_fn = self._compiled["train_multi"]
            for hosts, device, is_group in self._iter_batch_groups(loader, limit):
                fn = multi_fn if is_group else step_fn
                with self._time_phase("train_step"):
                    self.state, metrics = fn(self.state, device)
                device_metrics.append(metrics)  # (k,)-stacked when grouped
                self.global_step += len(hosts)
                batches_done += len(hosts)
                self._maybe_midepoch_val(
                    val_every, batches_done - len(hosts), batches_done, val_loader
                )
                # a mid-epoch validation callback may request a stop —
                # honour it at the next batch boundary (Lightning epoch-loop
                # `done` semantics), not thousands of batches later
                if self.should_stop and self._early_stop_ok():
                    break
            return self._flush_metrics(device_metrics, tag="Train")

        for _, device_batch in self._iter_batches(loader, limit):
            with self._time_phase("train_step"):
                self.state, metrics = step_fn(self.state, device_batch)
            device_metrics.append(metrics)
            self.global_step += 1
            batches_done += 1
            self._maybe_midepoch_val(
                val_every, batches_done - 1, batches_done, val_loader
            )
            if self.should_stop and self._early_stop_ok():
                break

        return self._flush_metrics(device_metrics, tag="Train")

    def _eval_epoch(self, model, loader, tag: str) -> Dict[str, float]:
        step_fn = self._compiled["eval"]
        device_metrics: List[Dict] = []
        horizon_mse_acc, horizon_mae_acc = [], []
        results_dfs = []
        limit = self._resolve_limit(
            self.limit_test_batches if tag == "Test" else self.limit_val_batches,
            loader,
        )

        for batch_idx, (host_batch, device_batch) in enumerate(
            self._iter_batches(loader, limit)
        ):
            if self.profiler:
                with self.profiler.time(f"{tag.lower()}_step"):
                    metrics, h_mse, h_mae, y_hat = step_fn(self.state, device_batch)
            else:
                metrics, h_mse, h_mae, y_hat = step_fn(self.state, device_batch)
            device_metrics.append(metrics)
            horizon_mse_acc.append(h_mse)
            horizon_mae_acc.append(h_mae)

            if tag == "Validation":
                df = self._validation_results(model, host_batch, y_hat, batch_idx)
                if df is not None:
                    results_dfs.append(df)
                if (
                    self.save_validation_plots
                    and batch_idx in (0, 1, 2, 3, 4)
                    and is_main_process()
                ):
                    self._plot_batch(model, host_batch, y_hat, batch_idx)

        epoch_metrics = self._flush_metrics(device_metrics, tag=tag)

        # Per-horizon metrics over the first forecast_len_30 horizons
        # (reference base_model.py:121-141; emitted under separate MSE/MAE
        # keys — the reference's dict-key collision is fixed, values kept).
        if horizon_mse_acc:
            h_mse = np.mean(jax.device_get(horizon_mse_acc), axis=0)
            h_mae = np.mean(jax.device_get(horizon_mae_acc), axis=0)
            horizon_metrics = {}
            for i in range(min(model.forecast_len_30, h_mse.shape[0])):
                horizon_metrics[f"MSE_forecast_horizon_{i}/{tag}"] = float(h_mse[i])
                horizon_metrics[f"MAE_forecast_horizon_{i}/{tag}"] = float(h_mae[i])
            self.logger.log_metrics(horizon_metrics, self.global_step)
            epoch_metrics.update(horizon_metrics)
            self.callback_metrics.update(horizon_metrics)

        if tag == "Validation" and results_dfs and is_main_process():
            save_validation_results_to_logger(
                results_dfs=results_dfs,
                results_file_name=model.results_file_name,
                current_epoch=self.current_epoch,
                logger=self.logger,
            )
        return epoch_metrics

    def _host_local_array(self, array) -> np.ndarray:
        """Fetch a device array as THIS process's host-local rows.

        Single-process: plain ``device_get``. Multi-process: a globally
        data-sharded output is not fully addressable here, so concatenate
        the addressable shards in batch order (deduplicated — model-axis
        replicas hold the same rows), which matches the host-local truths
        and capacities of the batch this process contributed."""
        if jax.process_count() == 1:
            return np.asarray(jax.device_get(array))
        unique = {}
        for shard in array.addressable_shards:
            start = shard.index[0].start or 0
            unique.setdefault(start, shard.data)
        return np.concatenate(
            [np.asarray(unique[k]) for k in sorted(unique)], axis=0
        )

    def _plot_batch(self, model, host_batch: Batch, y_hat, batch_idx: int) -> None:
        """Upload a truth-vs-forecast summary plot for the first validation
        batches (reference ``base_model.py:194-220`` writes ``temp_{i}.html``
        and uploads to the experiment logger). Plot failures never interrupt
        training."""
        try:
            from predict_pv_yield_tpu.visualization import plot_batch_results

            if model.output_variable == "gsp_yield":
                y = np.asarray(host_batch.gsp.gsp_yield)[: model.batch_size, :, 0]
            else:
                y = np.asarray(host_batch.pv.pv_yield)[: model.batch_size, :, 0]
            figure = plot_batch_results(
                model_name=type(model).model_name,
                y=y,
                y_hat=self._host_local_array(y_hat)[: model.batch_size],
            )
            if figure is None:  # empty host-local shard: nothing to plot
                return
            path = f"temp_{batch_idx}.html"
            figure.write_html(path)
            self.logger.log_artifact(
                path, name=f"validation_plot_epoch_{self.current_epoch}_{batch_idx}.html"
            )
        except Exception as exc:  # pragma: no cover
            log.debug("validation plot failed: %s", exc)

    def _validation_results(self, model, host_batch: Batch, y_hat, batch_idx: int):
        """Reference ``base_model.py:222-239``: de-normalise to MW via
        gsp_capacity. Only meaningful when the model forecasts on the
        30-minute GSP grid (for 5-minute pv targets the reference code would
        shape-mismatch; we skip instead)."""
        gsp = host_batch.gsp
        if gsp.gsp_yield is None or gsp.gsp_capacity is None:
            return None
        forecast_len_30 = model.forecast_len_30
        if model.forecast_len != forecast_len_30:
            return None
        capacity = np.asarray(gsp.gsp_capacity)[:, -forecast_len_30:, 0]
        truths = np.asarray(gsp.gsp_yield)[:, -forecast_len_30:, 0] * capacity
        predictions = self._host_local_array(y_hat) * capacity
        t0 = (
            np.asarray(host_batch.metadata.t0_datetime_utc)
            if host_batch.metadata.t0_datetime_utc is not None
            else np.zeros(truths.shape[0], dtype="int64")
        )
        return make_validation_results(
            truths_mw=truths,
            predictions_mw=predictions,
            capacity_mwp=capacity,
            gsp_ids=np.asarray(gsp.gsp_id)[:, 0] if gsp.gsp_id is not None else np.zeros(truths.shape[0]),
            batch_idx=batch_idx,
            t0_datetimes_utc=t0,
        )

    def _flush_metrics(self, device_metrics: List[Dict], tag: str) -> Dict[str, float]:
        """One host sync per epoch: fetch accumulated device scalars, emit
        per-step rows and the ``*_epoch`` aggregates."""
        if not device_metrics:
            return {}
        host = jax.device_get(device_metrics)
        # steps_per_execution groups arrive as dicts of (k,) arrays — expand
        # back into one dict per optimiser step so log rows stay per-step.
        expanded: List[Dict] = []
        for entry in host:
            sample = next(iter(entry.values()))
            if np.ndim(sample) > 0:
                expanded.extend(
                    {k: v[i] for k, v in entry.items()}
                    for i in range(len(sample))
                )
            else:
                expanded.append(entry)
        host = expanded
        start = self.global_step - len(host)
        # Lightning's log_every_n_steps thins the TRAINING loop only —
        # validation/test always emit every per-step row.
        every = self.log_every_n_steps if tag == "Train" else 1
        for offset, step_metrics in enumerate(host):
            # train rows land on their own global step; val/test rows all
            # carry the CURRENT global step (Lightning) — back-dating them
            # onto the last-N train steps (or clamping to 0 in standalone
            # validate) would be meaningless
            step = (
                max(start + offset, 0) if tag == "Train" else self.global_step
            )
            # per-step rows land every Nth global step; epoch aggregates
            # below are always emitted.
            if (step + 1) % every:
                continue
            self.logger.log_metrics(
                {f"{k}/{tag}": float(v) for k, v in step_metrics.items()}, step
            )
        epoch_metrics = {
            f"{k}/{tag}_epoch": float(np.mean([m[k] for m in host]))
            for k in host[0]
        }
        self.logger.log_metrics(epoch_metrics, self.global_step)
        self.callback_metrics.update(epoch_metrics)
        return epoch_metrics

    # ------------------------------------------------------------------
    def validate(self, model=None, datamodule=None, dataloaders=None):
        """reference ``trainer.validate`` (training.py:80-81)."""
        _, val_loader = self._resolve_loaders(datamodule, None, dataloaders)
        if val_loader is None and dataloaders is not None:
            val_loader = dataloaders
        if datamodule is not None:
            self._datamodule = datamodule
        if self.state is None:
            self.setup(model, self._example_batch(val_loader))
        model = self._model
        self._offload_wire_cast(val_loader)
        try:
            metrics = self._eval_epoch(model, val_loader, tag="Validation")
        finally:
            self._remove_wire_cast()
        for cb in self.callbacks:
            cb.on_validation_epoch_end(self, model, metrics)
        self.logger.save()  # terminal finalize belongs to pipeline finish()
        return metrics

    def test(self, model=None, datamodule=None, dataloaders=None):
        datamodule = datamodule or self._datamodule
        loader = dataloaders
        if datamodule is not None:
            self._adopt_configuration(datamodule)
        if loader is None and datamodule is not None and hasattr(datamodule, "test_dataloader"):
            loader = datamodule.test_dataloader()
        if loader is None:
            raise ValueError("test() needs a datamodule or dataloaders")
        if self.state is None:
            self.setup(model, self._example_batch(loader))
        model = self._model
        self._offload_wire_cast(loader)
        try:
            return self._eval_epoch(model, loader, tag="Test")
        finally:
            self._remove_wire_cast()

    def predict(self, model=None, dataloaders=None):
        self._adopt_configuration(dataloaders)
        if self.state is None:
            self.setup(model, self._example_batch(dataloaders))
        step_fn = self._compiled["eval"]
        outputs = []
        for _, device_batch in self._iter_batches(dataloaders, None):
            _, _, _, y_hat = step_fn(self.state, device_batch)
            outputs.append(self._host_local_array(y_hat))
        return outputs
