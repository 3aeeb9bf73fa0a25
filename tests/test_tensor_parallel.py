"""Tensor parallelism on the mesh's ``model`` axis.

The reference has no TP (SURVEY §2.6 — DDP only); the mesh reserved a
``model`` axis from round 1 and this exercises it for real: the Perceiver's
attention/FF kernels are boxed with mesh-axis names
(``partition_attention=True``), the engine initialises them directly into
their shards, and one data+tensor-parallel training step must match the
fully-replicated run exactly (same math, different layout — GSPMD inserts
the psums).

Suite-cost note: XLA CPU compiles of the scanned perceiver dominate this
file, so the replicated and TP fits run ONCE in a module-scoped fixture
(checkpoint + validation attached to the TP fit) and every test asserts
against those shared results on deliberately small shapes (8 px grid,
latent_dim 8).
"""

import jax
import jax.tree_util as jtu
import numpy as np
import pytest

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params
from predict_pv_yield_tpu.training.engine import Trainer


def _model(partition_attention: bool) -> PerceiverModel:
    return PerceiverModel(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        embedding_dem=16,
        num_latents=8,
        latent_dim=8,
        partition_attention=partition_attention,
    )


def _dataset() -> FakeDataset:
    from tests.conftest import build_dataset_configuration

    configuration = build_dataset_configuration(
        sat_image_size=8, nwp_image_size=8, nwp_channel_count=10
    )
    configuration.input_data.default_forecast_minutes = 60
    return FakeDataset(configuration=configuration, length=2)


@pytest.fixture(scope="module")
def fits(tmp_path_factory):
    """One replicated fit and one TP fit (with checkpointing + validation),
    shared by every test in this module."""
    import os

    from predict_pv_yield_tpu.training.callbacks import ModelCheckpoint

    root = tmp_path_factory.mktemp("tp")
    cwd = os.getcwd()
    os.chdir(root)  # validation artifacts land here, not in the repo
    try:
        dataset = _dataset()

        # same partitioned module both times: mp=1 leaves every
        # shard-annotated param effectively replicated, mp=2 actually splits
        # them — identical math, different layout
        trainer_dp = Trainer(max_epochs=1, profiler=None)
        metrics_dp = trainer_dp.fit(_model(True), train_dataloaders=dataset)

        ckpt = ModelCheckpoint(dirpath=str(root / "ckpt"))
        trainer_tp = Trainer(
            max_epochs=1, profiler=None, model_parallel=2, callbacks=[ckpt],
        )
        metrics_tp = trainer_tp.fit(
            _model(True), train_dataloaders=dataset, val_dataloaders=dataset
        )
    finally:
        os.chdir(cwd)
    yield trainer_dp, metrics_dp, trainer_tp, metrics_tp, ckpt


def test_tensor_parallel_matches_replicated(fits):
    trainer_dp, metrics_dp, trainer_tp, metrics_tp, _ = fits

    assert dict(trainer_tp.mesh.shape) == {"data": 2, "model": 2}
    sharded = [
        jtu.keystr(path)
        for path, leaf in jtu.tree_leaves_with_path(trainer_tp.state.params)
        if any(axis == "model" for axis in leaf.sharding.spec if axis is not None)
    ]
    # qkv + out projections of cross/self attention + both FF layers, twice
    assert len(sharded) >= 10, sharded

    assert metrics_tp["NMAE/Train_epoch"] == pytest.approx(
        metrics_dp["NMAE/Train_epoch"], abs=1e-5
    )
    leaves_dp = jtu.tree_leaves(trainer_dp.state.params)
    leaves_tp = jtu.tree_leaves(trainer_tp.state.params)
    for leaf_dp, leaf_tp in zip(leaves_dp, leaves_tp):
        # sharded psums reduce in a different order -> f32 noise amplified
        # by Adam's g/(|g|+eps) normalisation on near-zero grads; bound well
        # below one optimiser step (lr=5e-4), don't expect bit equality
        np.testing.assert_allclose(
            np.asarray(leaf_dp), np.asarray(leaf_tp), atol=3e-4
        )


def test_partitioning_off_by_default(tmp_cwd):
    """Without model_parallel the model trains exactly as before and every
    param stays replicated."""
    trainer = Trainer(max_epochs=1, profiler=None)
    metrics = trainer.fit(_model(False), train_dataloaders=_dataset())
    assert np.isfinite(metrics["NMAE/Train_epoch"])
    for leaf in jtu.tree_leaves(trainer.state.params):
        assert all(axis is None for axis in leaf.sharding.spec)


def test_tensor_parallel_checkpoint_roundtrip(fits):
    """Sharded (TP) parameters checkpoint and restore into their shards."""
    from predict_pv_yield_tpu.training.callbacks import load_state

    _, _, trainer_tp, _, ckpt = fits
    assert ckpt.best_model_path

    restored = load_state(ckpt.best_model_path, trainer_tp.state)
    for before, after in zip(
        jtu.tree_leaves(trainer_tp.state.params), jtu.tree_leaves(restored.params)
    ):
        assert after.sharding == before.sharding
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))


def test_geglu_param_conversion_between_fused_and_tp_layouts():
    """partition_attention changes the GEGLU feed-forward param tree
    (fused 'in' -> in_value/in_gate); the converters let a replicated
    checkpoint restore into a TP model with identical numerics, and a TP
    tree fuse back for convert.py export (round-3 review)."""
    import jax
    from flax import traverse_util

    from predict_pv_yield_tpu.models.perceiver_core import (
        Perceiver,
        fuse_geglu_params,
        split_geglu_params,
    )

    kw = dict(
        input_channels=3, depth=3, num_latents=4, latent_dim=8,
        num_classes=5, weight_tie_layers=True, cross_dim_head=4,
        latent_dim_head=4, latent_heads=2,
    )
    data = jax.random.normal(jax.random.key(0), (2, 6, 6, 3))
    fused_model = Perceiver(**kw)
    variables = fused_model.init(jax.random.key(1), data)
    reference = np.asarray(fused_model.apply(variables, data))

    split_params = split_geglu_params(variables["params"])
    tp_model = Perceiver(**kw, partition_attention=True)
    out = tp_model.apply({"params": split_params}, data)
    np.testing.assert_allclose(np.asarray(out), reference, atol=1e-5)

    refused = fuse_geglu_params(split_params)
    flat1 = traverse_util.flatten_dict(variables["params"])
    flat2 = traverse_util.flatten_dict(refused)
    assert set(flat1) == set(flat2)
    for key in flat1:
        np.testing.assert_array_equal(
            np.asarray(flat1[key]), np.asarray(flat2[key])
        )
