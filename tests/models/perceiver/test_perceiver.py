"""Perceiver model tests — mirrors reference
``tests/models/perceiver/test_perceiver.py``."""

import jax

from predict_pv_yield_tpu.data.fake import FakeDataset
from predict_pv_yield_tpu.models.perceiver import PerceiverModel, params


def test_init_model():
    _ = PerceiverModel(history_minutes=30, forecast_minutes=30, nwp_channels=params["nwp_channels"])


def test_model_forward(configuration_perceiver):
    dataset_configuration = configuration_perceiver
    dataset_configuration.input_data.nwp.nwp_image_size_pixels = 16
    dataset_configuration.input_data.satellite.satellite_image_size_pixels = 16
    dataset_configuration.input_data.default_forecast_minutes = 60

    model = PerceiverModel(
        history_minutes=30,
        forecast_minutes=60,
        nwp_channels=params["nwp_channels"],
        embedding_dem=16,
        num_latents=8,
        latent_dim=16,
    )
    batch = FakeDataset(configuration=dataset_configuration)[0].numeric()
    variables = model.init(jax.random.key(0), batch)
    y = model.apply(variables, batch)

    assert len(y.shape) == 2
    assert y.shape[0] == dataset_configuration.process.batch_size
    assert y.shape[1] == 60 // 5


def test_weight_tying_first_layer_untied():
    """perceiver_pytorch's cache_fn ties layers 1..depth-1 but constructs
    layer 0 fresh (should_cache = i > 0). The flax encoder mirrors that: a
    ``block0`` parameter set plus ONE scanned ``block`` set — two blocks
    total, independent of depth."""
    import jax.numpy as jnp

    from predict_pv_yield_tpu.models.perceiver_core import Perceiver

    data = jnp.zeros((1, 8, 8, 3))

    def build(depth):
        model = Perceiver(
            input_channels=3, depth=depth, num_latents=4, latent_dim=16,
            num_classes=5, weight_tie_layers=True,
        )
        return model.init(jax.random.key(0), data)

    shallow, deep = build(2), build(6)
    for variables, depth in ((shallow, 2), (deep, 6)):
        names = set(variables["params"])
        assert "block0" in names and "block" in names, names
    n = lambda v: sum(x.size for x in jax.tree_util.tree_leaves(v))  # noqa: E731
    assert n(shallow) == n(deep)  # O(1) parameters in depth

    # depth=1 has no tied remainder at all
    assert "block" not in build(1)["params"]


def test_depth_unroll_equals_scan():
    """``depth_unroll=True`` replaces the nn.scan depth loop with depth-1
    inlined calls of one shared block (so XLA CSE can hoist the
    loop-invariant K/V projections — measured 104.3 -> 75.3 ms/step on the
    flagship, PARITY.md). Same param tree, same numerics."""
    import jax.numpy as jnp
    import numpy as np

    from predict_pv_yield_tpu.models.perceiver_core import Perceiver

    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 3)).astype(np.float32)
    )
    kwargs = dict(
        input_channels=3, depth=5, num_latents=4, latent_dim=16,
        num_classes=5, weight_tie_layers=True,
    )
    scan_model = Perceiver(**kwargs)
    unroll_model = Perceiver(**kwargs, depth_unroll=True)
    variables = scan_model.init(jax.random.key(0), data)
    assert jax.tree_util.tree_structure(
        unroll_model.init(jax.random.key(0), data)
    ) == jax.tree_util.tree_structure(variables)
    np.testing.assert_allclose(
        np.asarray(scan_model.apply(variables, data)),
        np.asarray(unroll_model.apply(variables, data)),
        rtol=1e-6, atol=1e-6,
    )
