"""Multi-host helper semantics (single-process where testable)."""

import jax
import numpy as np
import pytest

from predict_pv_yield_tpu.parallel.distributed import (
    global_batch_from_host_local,
    host_local_batch_slice,
    initialize_distributed,
)
from predict_pv_yield_tpu.parallel.mesh import batch_sharding, build_mesh


def test_initialize_noop_single_process():
    initialize_distributed()  # must not raise or start a coordinator


def test_host_local_batch_slice_single_process():
    # single process owns the whole batch; any size divides 1
    assert host_local_batch_slice(32) == slice(0, 32)
    assert host_local_batch_slice(33) == slice(0, 33)


def test_global_batch_from_host_local_roundtrip():
    mesh = build_mesh(data_parallel=8)
    sharding = batch_sharding(mesh)
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    out = global_batch_from_host_local(local, sharding)
    assert out.shape == (16, 3)  # single process: global == local
    np.testing.assert_array_equal(np.asarray(out), local)
    assert len(out.sharding.device_set) == 8
