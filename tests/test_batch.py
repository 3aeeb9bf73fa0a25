"""Batch pytree contract tests."""

import jax
import numpy as np

from predict_pv_yield_tpu.data.batch import Batch, batch_shapes, as_batch
from predict_pv_yield_tpu.data.fake import FakeDataset, fake_batch


def test_shapes_from_configuration(configuration):
    shapes = batch_shapes(configuration)
    # defaults: 30/60 minutes -> T5 = 6+12+1 = 19, T30 = 1+2+1 = 4, T60 = 1+1+1 = 3
    assert shapes["satellite"]["data"] == (2, 11, 19, 64, 64)
    assert shapes["nwp"]["data"] == (2, 10, 3, 16, 16)
    assert shapes["pv"]["pv_yield"] == (2, 19, 128)
    assert shapes["gsp"]["gsp_yield"] == (2, 4, 32)
    assert shapes["gsp"]["gsp_capacity"] == (2, 4, 32)
    assert shapes["metadata"]["t0_datetime_utc"] == (2,)


def test_from_dict_rejects_unknown_fields():
    """BatchML(**x) raises on unexpected fields; silently dropping a typo'd
    key would train without that input (round-3 review)."""
    import pytest

    from predict_pv_yield_tpu.data.batch import Batch

    with pytest.raises(TypeError, match="unknown fields.*pv_yeild"):
        Batch.from_dict({"pv": {"pv_yeild": None}})


def test_fake_dataset_deterministic(configuration):
    ds = FakeDataset(configuration=configuration, length=3)
    a = ds[1]
    b = ds[1]
    np.testing.assert_array_equal(a.satellite.data, b.satellite.data)
    assert len(ds) == 3
    ds.length = 1  # settable, reference test_conv3d_model.py:54
    assert len(list(iter(ds))) == 1


def test_batch_is_pytree(configuration):
    batch = FakeDataset(configuration=configuration)[0]
    leaves = jax.tree_util.tree_leaves(batch)
    assert len(leaves) > 5
    roundtrip = jax.tree.map(lambda x: x, batch)
    assert isinstance(roundtrip, Batch)


def test_numeric_drops_int64(configuration):
    batch = FakeDataset(configuration=configuration)[0]
    assert batch.metadata.t0_datetime_utc.dtype == np.int64
    numeric = batch.numeric()
    assert numeric.metadata.t0_datetime_utc is None
    assert numeric.gsp.gsp_datetime_index is None
    for leaf in jax.tree_util.tree_leaves(numeric):
        assert leaf.dtype != np.int64


def test_dict_access_and_promotion(configuration):
    batch = FakeDataset(configuration=configuration)[0]
    assert batch["pv_yield"] is batch.pv.pv_yield
    assert batch["gsp_yield"] is batch.gsp.gsp_yield
    assert batch["nwp"] is batch.nwp.data

    as_dict = {
        "satellite": {"data": np.zeros((2, 1, 3, 4, 4), np.float32)},
        "pv": {"pv_yield": np.zeros((2, 3, 128), np.float32)},
    }
    promoted = as_batch(as_dict)
    assert promoted.satellite.data.shape == (2, 1, 3, 4, 4)
    assert promoted.nwp.data is None
    assert as_batch(promoted) is promoted
