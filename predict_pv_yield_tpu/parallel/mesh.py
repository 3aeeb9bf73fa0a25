"""Device-mesh construction and sharding policy.

The reference's only parallelism is PyTorch-Lightning DDP over NCCL
(reference ``experiments/003...py:288-294``; ``sync_dist=True`` metric
reductions at ``base_model.py:108-119``). The TPU-native equivalent
(SURVEY §2.6) is single-controller JAX: one ``Mesh`` over all chips with a
``data`` axis, batches sharded over it, parameters replicated, and XLA
inserting the gradient/metric collectives over ICI (intra-slice) and DCN
(inter-slice) automatically under ``jit``. No hand-written collectives are
needed for data parallelism — the GSPMD partitioner derives ``psum`` from the
sharding annotations.

A ``model`` axis is provisioned for future tensor-parallel layouts (absent in
the reference; SURVEY §2.6 rows TP/PP/SP — "not required for parity").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """A (data, model) mesh over the given devices (default: all).

    ``data_parallel`` defaults to ``len(devices) // model_parallel``. Device
    order follows ``jax.devices()``, which is ICI-contiguous on TPU slices, so
    the data axis rides ICI before DCN.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if data_parallel is None:
        data_parallel = len(devices) // model_parallel
    if data_parallel < 1 or data_parallel * model_parallel > len(devices):
        # a zero-device mesh reshapes fine and only explodes much later
        # inside XLA sharding errors — fail at the misconfiguration
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} (data x model) does not "
            f"fit on {len(devices)} devices"
        )
    n = data_parallel * model_parallel
    grid = np.asarray(devices[:n]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_for_batch(
    batch_size: int,
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Largest (data, model) mesh whose data axis divides ``batch_size``.

    Keeps sharding exact (no padding) for any batch size — e.g. the test
    suite's batch-2 fake batches on an 8-device CPU mesh use 2 devices.
    ``model_parallel`` reserves that many devices per data-parallel replica
    for tensor-parallel parameter shards.
    """
    if devices is None:
        devices = jax.devices()
    if model_parallel < 1 or model_parallel > len(devices):
        raise ValueError(
            f"model_parallel={model_parallel} does not fit on "
            f"{len(devices)} devices"
        )
    n = len(devices) // model_parallel
    n_procs = jax.process_count()
    if n_procs > 1:
        # Multi-host: every process must own the same number of data-axis
        # shards (``make_array_from_process_local_data`` assembles each
        # host's local rows into its addressable shards), so the data axis
        # must stay a multiple of the process count and the devices must be
        # drawn evenly from every process.
        n -= n % n_procs
        while n > n_procs and batch_size % n != 0:
            n -= n_procs
        if n < n_procs or batch_size % n != 0:
            raise ValueError(
                f"global batch {batch_size} cannot be sharded evenly over "
                f"{n_procs} processes (data axis candidates exhausted)"
            )
        per_process = (n // n_procs) * model_parallel
        by_process: dict = {}
        for device in devices:
            by_process.setdefault(device.process_index, []).append(device)
        chosen = []
        for pid in sorted(by_process):
            local = by_process[pid]
            if len(local) < per_process:
                raise ValueError(
                    f"process {pid} holds {len(local)} of the given devices "
                    f"but an even {n}-way data axis over {n_procs} processes "
                    f"needs {per_process} per process"
                )
            chosen.extend(local[:per_process])
        return build_mesh(chosen, data_parallel=n, model_parallel=model_parallel)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return build_mesh(devices, data_parallel=n, model_parallel=model_parallel)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimiser state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a Batch pytree with its leading dim sharded over ``data``.

    This is the host→HBM boundary: one transfer per leaf, laid out directly
    into each device's shard (no full-batch staging on any single device).
    """
    sharding = batch_sharding(mesh)
    return jax.device_put(batch, sharding)


def is_main_process() -> bool:
    """Rank-zero guard for logging/IO, the JAX analog of the reference's
    ``rank_zero_only`` wrappers (reference ``utils.py:35-46``)."""
    return jax.process_index() == 0
