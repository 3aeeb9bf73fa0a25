"""Engine behaviour: sharded training, checkpoints, early stopping, resume.

These run on the 8-device virtual CPU mesh — exercising the real pjit/mesh
code path that the reference never tested (SURVEY §4)."""

import os

import jax
import numpy as np
import pytest

from predict_pv_yield_tpu.data.fake import FakeDataset, fake_batch
from predict_pv_yield_tpu.config.dataset import Configuration
from predict_pv_yield_tpu.models.baseline import Model as Baseline
from predict_pv_yield_tpu.models.conv3d import Model as Conv3d
from predict_pv_yield_tpu.parallel.mesh import mesh_for_batch
from predict_pv_yield_tpu.training.callbacks import EarlyStopping, ModelCheckpoint
from predict_pv_yield_tpu.training.engine import Trainer
from predict_pv_yield_tpu.training.loggers import CSVLogger
from predict_pv_yield_tpu.utils import load_config


@pytest.fixture()
def sharded_configuration():
    """batch_size 8 -> divides the 8-device test mesh exactly."""
    configuration = Configuration()
    configuration.process.batch_size = 8
    configuration.input_data.default_history_minutes = 60
    configuration.input_data.default_forecast_minutes = 60
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.nwp.nwp_image_size_pixels = 2
    configuration.input_data.satellite.satellite_image_size_pixels = 16
    return configuration


def test_mesh_uses_all_devices(sharded_configuration):
    assert len(jax.devices()) == 8, "tests must run on the 8-device CPU mesh"
    mesh = mesh_for_batch(8)
    assert mesh.shape["data"] == 8
    # non-divisible batch sizes fall back to the largest divisor
    assert mesh_for_batch(2).shape["data"] == 2
    assert mesh_for_batch(3).shape["data"] == 3
    assert mesh_for_batch(7).shape["data"] == 7


def test_sharded_training_step(sharded_configuration, tmp_cwd):
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    model = Conv3d(**config)
    ds = FakeDataset(configuration=sharded_configuration, length=2)
    trainer = Trainer(max_epochs=1, profiler=None)
    metrics = trainer.fit(model, train_dataloaders=ds, val_dataloaders=ds)
    assert trainer.mesh.shape["data"] == 8
    assert np.isfinite(metrics["NMAE/Train_epoch"])
    assert np.isfinite(metrics["MSE/Validation_epoch"])


def test_checkpoint_and_resume(configuration, tmp_cwd):
    model = Baseline(forecast_minutes=60, history_minutes=30, output_variable="gsp_yield")
    ds = FakeDataset(configuration=configuration, length=2)
    ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / "ckpt"))
    trainer = Trainer(max_epochs=1, profiler=None, callbacks=[ckpt], logger=CSVLogger(save_dir=str(tmp_cwd)))
    trainer.fit(model, train_dataloaders=ds, val_dataloaders=ds)
    assert ckpt.best_model_path
    assert os.path.isdir(ckpt.best_model_path)
    assert os.path.isdir(os.path.join(str(tmp_cwd / "ckpt"), "last"))

    # resume: a fresh trainer restores the saved state without error
    trainer2 = Trainer(max_epochs=1, profiler=None, resume_from_checkpoint=ckpt.best_model_path)
    metrics = trainer2.validate(model, dataloaders=ds)
    assert np.isfinite(metrics["NMAE/Validation_epoch"])


def test_early_stopping(configuration, tmp_cwd):
    model = Baseline(forecast_minutes=60, history_minutes=30, output_variable="gsp_yield")
    ds = FakeDataset(configuration=configuration, length=2)
    # baseline never improves -> patience 1 stops by epoch 2 at the latest
    stopper = EarlyStopping(patience=1)
    trainer = Trainer(max_epochs=10, profiler=None, callbacks=[stopper])
    trainer.fit(model, train_dataloaders=ds, val_dataloaders=ds)
    assert trainer.should_stop
    assert trainer.current_epoch <= 2, trainer.current_epoch


def test_bf16_precision(configuration_conv3d, tmp_cwd):
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    model = Conv3d(**config)
    ds = FakeDataset(configuration=configuration_conv3d, length=1)
    trainer = Trainer(max_epochs=1, profiler=None, precision=16)
    metrics = trainer.fit(model, train_dataloaders=ds)
    assert np.isfinite(metrics["NMAE/Train_epoch"])


def test_grad_accumulation(configuration_conv3d, tmp_cwd):
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    model = Conv3d(**config)
    ds = FakeDataset(configuration=configuration_conv3d, length=2)
    trainer = Trainer(max_epochs=1, profiler=None, accumulate_grad_batches=2)
    metrics = trainer.fit(model, train_dataloaders=ds)
    assert np.isfinite(metrics["NMAE/Train_epoch"])


def test_steps_per_execution_matches_single_step(sharded_configuration, tmp_cwd):
    """k train steps fused into one dispatch (lax.scan) must be numerically
    equivalent to k separate dispatches, including a leftover short group."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=5)

    def run(steps_per_execution):
        model = Conv3d(**config)
        trainer = Trainer(
            max_epochs=1, profiler=None,
            steps_per_execution=steps_per_execution,
        )
        metrics = trainer.fit(model, train_dataloaders=ds)
        return trainer, metrics

    trainer1, metrics1 = run(1)
    trainer2, metrics2 = run(2)  # groups of 2 + one leftover single step

    assert trainer1.global_step == trainer2.global_step == 5
    assert metrics2["NMAE/Train_epoch"] == pytest.approx(
        metrics1["NMAE/Train_epoch"], abs=1e-6
    )
    leaves1 = jax.tree_util.tree_leaves(trainer1.state.params)
    leaves2 = jax.tree_util.tree_leaves(trainer2.state.params)
    for l1, l2 in zip(leaves1, leaves2):
        # scanned vs unscanned programs fuse differently → f32 reduction
        # order differs; bound the drift rather than expect bit equality
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_lightning_parity_knobs(sharded_configuration, tmp_cwd):
    """max_steps, check_val_every_n_epoch, num_sanity_val_steps and
    gradient_clip_val have real semantics (not Lightning-compat no-ops)."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=4)

    # max_steps stops mid-epoch; sanity check doesn't advance global_step
    trainer = Trainer(
        max_epochs=5, profiler=None, max_steps=3, num_sanity_val_steps=1,
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert trainer.global_step == 3

    # check_val_every_n_epoch=2 over 2 epochs -> exactly one val epoch
    seen = []

    class CountVal:
        def on_fit_start(self, trainer, model): pass
        def on_train_epoch_end(self, trainer, model, metrics): pass
        def on_validation_epoch_end(self, trainer, model, metrics):
            seen.append(trainer.current_epoch)
        def on_fit_end(self, trainer, model): pass

    trainer = Trainer(
        max_epochs=2, profiler=None, check_val_every_n_epoch=2,
        callbacks=[CountVal()],
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert seen == [1]

    # gradient clipping changes the step taken for identical data/seed
    def one_step(clip):
        trainer = Trainer(
            max_epochs=1, profiler=None, limit_train_batches=1,
            gradient_clip_val=clip,
        )
        trainer.fit(Conv3d(**config), train_dataloaders=ds)
        return np.concatenate([
            np.asarray(leaf).ravel()
            for leaf in jax.tree_util.tree_leaves(trainer.state.params)
        ])

    unclipped = one_step(0.0)
    clipped = one_step(1e-6)
    assert not np.allclose(unclipped, clipped)


def test_fractional_limits_grad_norm_log_every(sharded_configuration, tmp_cwd):
    """Float batch limits are epoch fractions (reference
    configs/trainer/all_params.yaml:24-26 semantics), track_grad_norm logs
    the in-step global grad norm, and log_every_n_steps thins per-step rows
    without touching the epoch aggregates."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=8)
    logger = CSVLogger(save_dir=str(tmp_cwd))
    trainer = Trainer(
        max_epochs=1, profiler=None, logger=logger,
        limit_train_batches=0.5, limit_val_batches=0.25,
        track_grad_norm=2, log_every_n_steps=2,
    )
    metrics = trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert trainer.global_step == 4  # 0.5 of the 8-batch epoch

    key = "grad_2.0_norm_total/Train_epoch"
    assert key in metrics
    assert np.isfinite(metrics[key]) and metrics[key] > 0

    # per-step train rows land only on global steps 1 and 3 ((step+1) % 2 == 0)
    train_steps = [r["step"] for r in logger._rows if "NMAE/Train" in r]
    assert train_steps == [1, 3]
    assert any("NMAE/Train_epoch" in r for r in logger._rows)
    # limit_val_batches=0.25 of the 8-batch val loader -> exactly 2 val
    # batches ran (val per-step rows are never thinned)
    val_rows = [r for r in logger._rows if "NMAE/Validation" in r]
    assert len(val_rows) == 2, len(val_rows)

    # a fraction on a length-less loader must fail loudly, not silently run
    with pytest.raises(ValueError, match="fractional"):
        trainer._resolve_limit(0.5, iter(()))


def test_val_check_interval_and_min_steps(sharded_configuration, tmp_cwd):
    """val_check_interval=0.5 on an 8-batch epoch validates mid-epoch at
    batch 4 and at the epoch boundary (not twice there); min_steps holds off
    an early stop signalled from the very first validation."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=8)
    val_steps = []

    class RecordVal:
        def on_fit_start(self, trainer, model): pass
        def on_train_epoch_end(self, trainer, model, metrics): pass
        def on_fit_end(self, trainer, model): pass
        def on_validation_epoch_end(self, trainer, model, metrics):
            val_steps.append(trainer.global_step)
            trainer.should_stop = True  # fires at the first val already

    ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / "ckpt"), save_top_k=2)
    trainer = Trainer(
        max_epochs=3, profiler=None, val_check_interval=0.5,
        min_steps=12, callbacks=[RecordVal(), ckpt],
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    # 2 val passes per 8-batch epoch (after batch 4 and 8); the epoch-end
    # pass is not duplicated. should_stop from step 4 is deferred by
    # min_steps=12, then honoured MID-EPOCH at the step-12 validation
    # (Lightning epoch-loop `done` semantics) — the epoch does not run out.
    assert val_steps == [4, 8, 12]
    assert trainer.global_step == 12
    # two same-epoch validations hit the same checkpoint filename; with
    # top-2 both must be kept under DISTINCT (versioned) names
    assert ckpt.best_model_path and os.path.exists(ckpt.best_model_path)
    assert len(ckpt.best_k) == 2
    assert len({p for _, p in ckpt.best_k}) == 2
    for _, path in ckpt.best_k:
        assert os.path.exists(path), path

    # a float > 1 is a misconfiguration, not "every N batches"
    with pytest.raises(ValueError, match="val_check_interval"):
        Trainer(val_check_interval=2.0)


def test_val_interval_composes_with_limits_and_epoch_gate(
    sharded_configuration, tmp_cwd
):
    """The val_check_interval fraction resolves against the LIMITED epoch
    length, and check_val_every_n_epoch gates mid-epoch passes too."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=8)
    val_steps = []

    class RecordVal:
        def on_fit_start(self, trainer, model): pass
        def on_train_epoch_end(self, trainer, model, metrics): pass
        def on_fit_end(self, trainer, model): pass
        def on_validation_epoch_end(self, trainer, model, metrics):
            val_steps.append(trainer.global_step)

    trainer = Trainer(
        max_epochs=2, profiler=None, val_check_interval=0.5,
        limit_train_batches=4, check_val_every_n_epoch=2,
        callbacks=[RecordVal()],
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    # epoch 0: no validation at all (gated to every 2nd epoch). epoch 1:
    # 4-batch effective epoch -> val every int(4*0.5)=2 batches, at global
    # steps 6 and 8; the step-8 pass covers the epoch boundary once.
    assert val_steps == [6, 8]


def test_log_every_n_steps_thins_train_only():
    """Lightning applies log_every_n_steps to the training loop only —
    validation/test per-step rows are never thinned."""
    trainer = Trainer(profiler=None, log_every_n_steps=50)
    rows = []

    class RecordingLogger:
        def log_metrics(self, metrics, step):
            rows.append(dict(metrics))

    trainer.logger = RecordingLogger()
    trainer.global_step = 8
    metrics = [{"NMAE": np.float32(i)} for i in range(8)]
    trainer._flush_metrics(list(metrics), tag="Validation")
    assert sum("NMAE/Validation" in r for r in rows) == 8
    rows.clear()
    trainer._flush_metrics(list(metrics), tag="Train")
    # 8 train steps, none on a 50-step boundary -> only the epoch aggregate
    assert sum("NMAE/Train" in r for r in rows) == 0
    assert sum("NMAE/Train_epoch" in r for r in rows) == 1


def test_checkpoint_version_suffix_preserves_better_save(tmp_cwd):
    """A worse-but-qualifying later score in the same epoch gets a -v1
    filename (Lightning's versioning) instead of overwriting the better
    checkpoint already holding the {epoch} name."""
    from predict_pv_yield_tpu.training.callbacks import load_state

    class StubEngine:
        sanity_checking = False
        current_epoch = 0
        state = {"w": np.arange(3.0, dtype=np.float32)}

    engine = StubEngine()
    ckpt = ModelCheckpoint(
        dirpath=str(tmp_cwd / "ck"), save_top_k=2, save_last=False
    )
    ckpt.on_validation_epoch_end(engine, None, {"MSE/Validation_epoch": 0.1})
    engine.state = {"w": np.arange(3.0, dtype=np.float32) + 100.0}
    ckpt.on_validation_epoch_end(engine, None, {"MSE/Validation_epoch": 0.5})
    assert ckpt.best_model_score == 0.1
    assert ckpt.best_model_path.endswith("epoch_000")
    paths = {p for _, p in ckpt.best_k}
    assert len(paths) == 2 and any(p.endswith("-v1") for p in paths)
    restored = load_state(ckpt.best_model_path, {"w": np.zeros(3, np.float32)})
    np.testing.assert_array_equal(restored["w"], np.arange(3.0, dtype=np.float32))


def test_reload_keeps_explicit_loaders(sharded_configuration, tmp_cwd):
    """reload_dataloaders_every_epoch refreshes only datamodule-sourced
    loaders; an explicitly passed train loader survives the reload even
    when the datamodule cannot provide one."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    val_calls = []

    class ValOnlyDM:
        def val_dataloader(self):
            val_calls.append(1)
            return FakeDataset(configuration=sharded_configuration, length=1)

    explicit = FakeDataset(configuration=sharded_configuration, length=2)
    trainer = Trainer(
        max_epochs=2, profiler=None, reload_dataloaders_every_epoch=True,
    )
    trainer.fit(
        Conv3d(**config), datamodule=ValOnlyDM(), train_dataloaders=explicit
    )
    assert trainer.global_step == 4  # 2 epochs x 2 batches, no crash
    assert len(val_calls) == 2  # initial resolve + the epoch-1 reload


def test_fast_dev_run_no_side_effects(sharded_configuration, tmp_cwd):
    """fast_dev_run = 1 train + 1 val batch with checkpointing, early
    stopping and tuners disabled (Lightning dev-run contract)."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=4)
    ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / "ck"))
    # pre-armed: any validation score counts as "no improvement", so the
    # callback WOULD stop if it ran — the assertion below is only satisfied
    # by the fast_dev_run gate, not by the score happening to improve
    stopper = EarlyStopping(patience=1)
    stopper.best = -1e9
    trainer = Trainer(
        max_epochs=5, profiler=None, fast_dev_run=True, auto_lr_find=True,
        callbacks=[ckpt, stopper],
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert trainer.global_step == 1
    assert not os.path.exists(tmp_cwd / "ck")  # no checkpoint writes
    assert not trainer.should_stop  # early stopping off
    assert trainer.lr_find_results is None  # tuner skipped
    assert trainer.learning_rate == 5e-4


def test_lr_find_and_auto_lr_find(sharded_configuration, tmp_cwd, caplog):
    """The LR range test sweeps min_lr->max_lr over real train steps,
    suggests the steepest-descent LR, and auto_lr_find adopts it in fit;
    weights_summary logs the per-module parameter table at setup."""
    import logging

    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=4)

    trainer = Trainer(max_epochs=1, profiler=None)
    suggestion = trainer.lr_find(
        Conv3d(**config), train_dataloaders=ds,
        min_lr=1e-6, max_lr=1.0, num_training=12,
    )
    results = trainer.lr_find_results
    assert 1e-6 <= suggestion <= 1.0
    assert results["suggestion"] == suggestion
    assert len(results["lr"]) == len(results["loss"]) <= 12
    # the sweep actually moved the lr exponentially
    assert results["lr"][0] == pytest.approx(1e-6)
    assert results["lr"][-1] > results["lr"][0]
    # sweep state was discarded
    assert trainer.state is None and trainer.global_step == 0

    # dict form: enables the tuner AND bounds the sweep (suite cost)
    auto = Trainer(
        max_epochs=1, profiler=None, auto_lr_find={"num_training": 8},
        limit_train_batches=1,
    )
    with caplog.at_level(logging.INFO):
        auto.fit(Conv3d(**config), train_dataloaders=ds)
    assert auto.learning_rate != 5e-4  # suggestion adopted
    assert auto.lr_find_results is not None
    assert any("weights summary" in r.message for r in caplog.records)
    assert any("auto_lr_find" in r.message for r in caplog.records)

    # trainer.tune(): no-op without auto_lr_find; adopts the suggestion with
    tuned = Trainer(max_epochs=1, profiler=None).tune(Conv3d(**config))
    assert tuned == {}
    tuner = Trainer(max_epochs=1, profiler=None, auto_lr_find=True)
    tuned = tuner.tune(
        Conv3d(**config), train_dataloaders=ds,
        min_lr=1e-6, max_lr=1e-2, num_training=6,
    )
    assert tuner.learning_rate == tuned["lr_find"]["suggestion"]


def test_reload_dataloaders_every_epoch(sharded_configuration, tmp_cwd):
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    calls = []

    class DM:
        def train_dataloader(self):
            calls.append("train")
            return FakeDataset(configuration=sharded_configuration, length=2)

        def val_dataloader(self):
            return FakeDataset(configuration=sharded_configuration, length=1)

    trainer = Trainer(
        max_epochs=3, profiler=None, reload_dataloaders_every_epoch=True,
    )
    trainer.fit(Conv3d(**config), datamodule=DM())
    # initial resolve + a fresh loader for epochs 1 and 2
    assert calls.count("train") == 3


def test_overfit_batches(sharded_configuration, tmp_cwd):
    """overfit_batches pins the first N train batches and validates on the
    SAME cached batches — even with no val loader passed (Lightning
    semantics; fraction 0.25 of the 8-batch epoch -> 2 batches)."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    inner = FakeDataset(configuration=sharded_configuration, length=8)
    accesses = []

    class CountingDataset:
        def __len__(self):
            return len(inner)

        def __getitem__(self, i):
            accesses.append(i)
            return inner[i]

    trainer = Trainer(max_epochs=2, profiler=None, overfit_batches=0.25)
    metrics = trainer.fit(Conv3d(**config), train_dataloaders=CountingDataset())
    assert trainer.global_step == 4  # 2 cached batches x 2 epochs
    assert "NMAE/Validation_epoch" in metrics
    # the dataset was read exactly once per cached batch: every later train
    # epoch AND every validation pass reused the SAME cached batches
    # (Lightning overfit semantics), never re-pulling from the source
    assert sorted(accesses) == [0, 1], accesses


def test_steps_per_execution_respects_limit(sharded_configuration, tmp_cwd):
    """limit_train_batches is exact in fused-dispatch mode: a limit that is
    not a multiple of k runs the remainder as single steps."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=8)
    trainer = Trainer(
        max_epochs=1, profiler=None, steps_per_execution=2,
        limit_train_batches=3,
    )
    trainer.fit(Conv3d(**config), train_dataloaders=ds)
    assert trainer.global_step == 3


def test_training_converges_on_fixed_batch(sharded_configuration):
    """Overfit sanity gate: repeating ONE fixed batch must drive the NMAE
    training loss down substantially — the full jitted
    forward→grad→Adam(5e-4) path actually learns, not just runs."""
    # the full 4-layer test model: the learning gate should exercise real
    # depth, and the tiny engine-test model converges too slowly to gate on.
    # lr 5e-3 (not the production 5e-4) so the gate needs 30 steps instead
    # of 80 — the production-lr OPTIMISER is already trajectory-gated by the
    # 8-step Adam torch parity test; this test only gates "learning happens",
    # and each step is ~1.4s of real conv3d FLOPs on the 1-core CI host
    config = load_config("tests/configs/model/conv3d.yaml")
    batch = fake_batch(sharded_configuration, np.random.default_rng(0))
    trainer = Trainer(max_epochs=1, profiler=None, learning_rate=5e-3)
    model = Conv3d(**config)
    trainer.setup(model, batch)
    device_batch = trainer._to_device(batch)

    # dispatch-per-step reuses the engine's already-built train program and
    # syncs per step (a lax.scan variant compiles 3x slower on the CPU
    # backend than these dispatches cost, and an unsynced dispatch queue
    # aborts it)
    step = trainer._compiled["train"]
    state = trainer.state
    losses = []
    for _ in range(30):
        state, metrics = step(state, device_batch)
        losses.append(float(jax.device_get(metrics["NMAE"])))
    assert np.isfinite(losses).all()
    # measured 0.595 at step 30 (deterministic CPU backend); 0.70 leaves
    # margin for backend numerics drift while still requiring real learning
    assert losses[-1] < 0.70 * losses[0], (losses[0], losses[-1])


def test_wire_float16_skips_coordinate_fields(sharded_configuration):
    """The f16 wire narrows data leaves but must NOT narrow OSGB coordinate
    planes (|x| ~ 1e6 overflows float16's 65504 max to inf — a round-4 bug
    caught as a RuntimeWarning in the zarr-stream bench)."""
    batch = fake_batch(sharded_configuration, np.random.default_rng(0))
    trainer = Trainer(max_epochs=1, profiler=None, wire_float16=True)
    cast = trainer._wire_cast(batch.numeric())
    assert cast.satellite.data.dtype == np.float16
    assert cast.pv.pv_yield.dtype == np.float16
    assert cast.satellite.x.dtype == np.float32
    assert cast.satellite.y.dtype == np.float32
    assert np.isfinite(cast.satellite.x).all()
    # every narrowed leaf stayed finite (nothing else overflows)
    import jax.tree_util as jtu

    for leaf in jtu.tree_leaves(cast):
        if isinstance(leaf, np.ndarray) and leaf.dtype == np.float16:
            assert np.isfinite(leaf).all()


def _state_arrays(state):
    """All params + optimiser-state leaves as host numpy arrays."""
    return [
        np.asarray(jax.device_get(leaf))
        for leaf in jax.tree_util.tree_leaves((state.params, state.opt_state))
        if hasattr(leaf, "shape")
    ]


def _assert_states_identical(state_a, state_b):
    """Params, Adam first/second moments, and the optimiser step counter
    must be BIT-identical — resume is exact, not approximately-restored."""
    leaves_a, leaves_b = _state_arrays(state_a), _state_arrays(state_b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(la, lb)
    assert int(state_a.step) == int(state_b.step)


def test_resume_exactness_epoch_boundary(configuration_conv3d, tmp_cwd):
    """Train 4 epochs uninterrupted vs train 2, kill, resume from the `last`
    checkpoint, train the remaining 2: final params, Adam moments, step
    counters, epoch counter, and EarlyStopping/ModelCheckpoint callback
    state must be bit-identical. The reference leaned on Lightning for this
    (reference configs/trainer/all_params.yaml:39 resume_from_checkpoint +
    SURVEY §5.4); a first-party engine must prove it itself."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=configuration_conv3d, length=3)

    def fit(max_epochs, ckpt_dir, resume=None):
        ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / ckpt_dir), save_last=True)
        es = EarlyStopping(patience=100)
        trainer = Trainer(
            max_epochs=max_epochs, profiler=None,
            callbacks=[es, ckpt], resume_from_checkpoint=resume,
        )
        trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
        return trainer, ckpt, es

    full, ckpt_full, es_full = fit(4, "full")

    part, ckpt_part, _ = fit(2, "part")
    resumed, _, es_resumed = fit(
        4, "resumed", resume=os.path.join(str(tmp_cwd / "part"), "last")
    )

    assert part.global_step == 6  # 2 epochs x 3 batches actually ran
    assert resumed.global_step == full.global_step == 12
    assert resumed.current_epoch == full.current_epoch == 3
    _assert_states_identical(full.state, resumed.state)
    # callback state survived the round-trip: EarlyStopping saw the same
    # validation history as the uninterrupted run
    assert es_resumed.state_dict() == es_full.state_dict()


def test_resume_exactness_mid_epoch(configuration_conv3d, tmp_cwd):
    """A checkpoint written by a MID-epoch validation (val_check_interval)
    resumes into the SAME epoch, skips exactly the batches already trained,
    and reproduces the uninterrupted run bit-for-bit — including the
    mid-epoch validation cadence after the resume point."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=configuration_conv3d, length=6)

    def fit(ckpt_dir, max_steps=None, resume=None):
        ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / ckpt_dir), save_last=True)
        trainer = Trainer(
            max_epochs=1, profiler=None, val_check_interval=3,
            max_steps=max_steps, callbacks=[ckpt], resume_from_checkpoint=resume,
        )
        trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
        return trainer

    full = fit("full")

    # interrupted at batch 3: the val_check_interval=3 validation fires
    # mid-epoch, writes `last`, then max_steps stops training
    part = fit("part", max_steps=3)
    assert part.global_step == 3

    resumed = fit(
        "resumed", resume=os.path.join(str(tmp_cwd / "part"), "last")
    )
    assert resumed.current_epoch == full.current_epoch == 0
    assert resumed.global_step == full.global_step == 6
    _assert_states_identical(full.state, resumed.state)


def test_resume_exactness_shuffled_loader(configuration_conv3d, tmp_cwd):
    """Mid-epoch resume must fast-forward through the SAME shuffle
    permutation the interrupted run trained. The loader's shuffle rng is
    pinned to the global epoch number (``PrefetchingLoader.set_epoch``,
    called by the engine each train epoch) — without that, a resumed run's
    fresh loader restarts its internal epoch counter at 0 and the skip
    drops batches of the WRONG permutation, silently training some batches
    twice and others never."""
    from predict_pv_yield_tpu.data.loader import PrefetchingLoader

    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=configuration_conv3d, length=6)

    def fit(ckpt_dir, max_steps=None, resume=None):
        ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / ckpt_dir), save_last=True)
        trainer = Trainer(
            max_epochs=2, profiler=None, val_check_interval=3,
            max_steps=max_steps, callbacks=[ckpt],
            resume_from_checkpoint=resume,
        )
        loader = PrefetchingLoader(ds, num_workers=0, shuffle=True, seed=7)
        trainer.fit(
            Conv3d(**config), train_dataloaders=loader, val_dataloaders=ds
        )
        return trainer

    full = fit("full")

    # interrupted mid-epoch 1 (the SECOND epoch): the val at global step 9
    # (batch 3 of 6 within epoch 1) writes `last`, then max_steps stops —
    # so the resume must re-enter epoch 1 and skip 3 batches of epoch 1's
    # permutation, not epoch 0's
    part = fit("part", max_steps=9)
    assert part.global_step == 9 and part.current_epoch == 1

    resumed = fit(
        "resumed", resume=os.path.join(str(tmp_cwd / "part"), "last")
    )
    assert resumed.global_step == full.global_step == 12
    _assert_states_identical(full.state, resumed.state)


def test_midtrain_checkpoint_lists_itself_in_loop_state(
    configuration_conv3d, tmp_cwd
):
    """The ``loop.json`` written into ``last`` (and into the new best
    checkpoint) already records the best-k entry saved at the SAME
    validation. A snapshot taken before the best-k bookkeeping would make a
    resume from ``last`` forget the best checkpoint written alongside it —
    the next validation would re-save a worse score as "best" and the test
    phase would load the wrong weights."""
    from predict_pv_yield_tpu.training.callbacks import load_loop_state

    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=configuration_conv3d, length=2)
    ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / "ck"), save_last=True)
    trainer = Trainer(max_epochs=1, profiler=None, callbacks=[ckpt])
    trainer.fit(Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds)
    assert ckpt.best_model_path

    for ckpt_path in (os.path.join(str(tmp_cwd / "ck"), "last"),
                      ckpt.best_model_path):
        loop = load_loop_state(ckpt_path)
        entry = next(
            e for e in loop["callbacks"] if e["class"] == "ModelCheckpoint"
        )
        assert entry["state"]["best_model_path"] == ckpt.best_model_path, (
            f"{ckpt_path}: loop.json does not list the best checkpoint "
            "written at the same validation"
        )
        assert entry["state"]["best_k"], f"{ckpt_path}: best_k empty"


def test_resume_exactness_fractional_val_interval(
    configuration_conv3d, tmp_cwd
):
    """A fractional ``val_check_interval`` derives its cadence from the FULL
    epoch length on resume, not the skip-reduced remainder — otherwise the
    resumed run validates at different steps than the run it resumes
    (extra validations advance EarlyStopping and write extra checkpoints)."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=configuration_conv3d, length=8)

    def fit(ckpt_dir, max_steps=None, resume=None):
        ckpt = ModelCheckpoint(dirpath=str(tmp_cwd / ckpt_dir), save_last=True)
        es = EarlyStopping(patience=100)
        trainer = Trainer(
            max_epochs=1, profiler=None, val_check_interval=0.5,
            limit_train_batches=6, max_steps=max_steps,
            callbacks=[es, ckpt], resume_from_checkpoint=resume,
        )
        trainer.fit(
            Conv3d(**config), train_dataloaders=ds, val_dataloaders=ds
        )
        return trainer, es

    # uninterrupted: limit 6, interval 0.5 -> val_every=3 (vals at 3 and 6)
    full, es_full = fit("full")

    part, _ = fit("part", max_steps=3)  # val at 3 writes `last`, then stop
    assert part.global_step == 3

    resumed, es_resumed = fit(
        "resumed", resume=os.path.join(str(tmp_cwd / "part"), "last")
    )
    assert resumed.global_step == full.global_step == 6
    _assert_states_identical(full.state, resumed.state)
    # same validation cadence after the resume point: EarlyStopping saw the
    # same number of validations with the same scores
    assert es_resumed.state_dict() == es_full.state_dict()


def test_wire_float16_auto_resolves_by_measurement(sharded_configuration, tmp_cwd):
    """``wire_float16="auto"`` probes cast+f16-ship vs plain f32-ship on the
    example batch at setup and resolves to a bool — the f16 wire trap
    (host cast cost silently breaking host >= device on a few-core rig)
    becomes a per-rig measured decision."""
    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=1)
    trainer = Trainer(max_epochs=1, profiler=None, wire_float16="auto")
    metrics = trainer.fit(Conv3d(**config), train_dataloaders=ds)
    assert isinstance(trainer.wire_float16, bool)
    assert np.isfinite(metrics["NMAE/Train_epoch"])


def test_wire_cast_offloads_to_loader_workers(sharded_configuration, tmp_cwd):
    """With a PrefetchingLoader, the f16 wire cast runs in the loader's
    worker threads (parallel + overlapped), not serialised on the consumer
    thread — and is UNINSTALLED when the phase ends: the closure pins the
    trainer (and its device state) alive and would silently f16-narrow
    batches for any later non-engine consumer of the user-owned loader.
    A user-owned transform is never touched."""
    from predict_pv_yield_tpu.data.loader import PrefetchingLoader

    config = load_config("tests/configs/model/conv3d_tiny.yaml")
    ds = FakeDataset(configuration=sharded_configuration, length=2)
    loader = PrefetchingLoader(ds, num_workers=2, prefetch_factor=2)

    trainer_on = Trainer(max_epochs=1, profiler=None, wire_float16=True)
    metrics = trainer_on.fit(Conv3d(**config), train_dataloaders=loader)
    assert np.isfinite(metrics["NMAE/Train_epoch"])
    # phase teardown removed the engine's transform from the user's loader
    assert loader.transform is None

    # the install/uninstall contract, directly: the installed transform
    # narrows data leaves but not OSGB coordinates, and removal restores
    # the loader
    trainer_on._offload_wire_cast(loader)
    assert getattr(loader.transform, "_engine_wire_cast", False)
    cast = loader.transform(ds[0])
    assert cast.satellite.data.dtype == np.float16
    assert cast.satellite.x.dtype == np.float32
    trainer_on._remove_wire_cast()
    assert loader.transform is None

    user_fn = lambda b: b
    loader.transform = user_fn
    trainer_on2 = Trainer(max_epochs=1, profiler=None, wire_float16=True)
    trainer_on2.fit(Conv3d(**config), train_dataloaders=loader)
    assert loader.transform is user_fn
