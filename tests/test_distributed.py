"""Multi-host semantics: single-process helper contracts plus a REAL
two-process run — two interpreters join over ``jax.distributed.initialize``
(4 virtual CPU devices each), each loads its host-local half of a global
batch, and one sharded train step must leave both with identical replicated
parameters. This executes the engine's multi-host branch
(``Trainer._to_device`` → ``global_batch_from_host_local``) end to end."""

import os
import socket
import subprocess
import sys

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


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def test_two_process_distributed_train_step():
    """Reference DDP equivalence (configs/trainer/all_params.yaml:8-9): two
    processes, 8 global devices, one data-parallel train step, identical
    post-step parameters on every process."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "mp_distributed_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # fresh interpreters must stay CPU
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outputs.append(out)
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outputs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-2000:]
        fields = dict(kv.split("=") for kv in line[0].split()[1:])
        results[int(fields["process"])] = fields
    assert set(results) == {0, 1}
    assert results[0]["digest"] == results[1]["digest"]
    assert results[0]["nmae"] == results[1]["nmae"]
    assert np.isfinite(float(results[0]["nmae"]))
