"""Multi-host (multi-process) initialisation and per-host data sharding.

The reference's multi-device story is Lightning DDP: one python process per
GPU, NCCL all-reduce, ``num_nodes``/``num_processes`` trainer flags
(reference ``experiments/003...py:288-294``, ``configs/trainer/
all_params.yaml:8-9``). The TPU-native equivalent (SURVEY §5.8) is
single-controller-per-host JAX: every host calls
``jax.distributed.initialize``, sees all chips in ``jax.devices()``, and the
engine's single ``Mesh`` spans the full slice — XLA routes the gradient
reductions over ICI within a slice and DCN across slices. No communication
code exists in the framework at all; this module only owns process bootstrap
and the host-local view of the global batch.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bootstrap multi-host JAX.

    On Cloud TPU the arguments are discovered from the metadata server and
    may be omitted; elsewhere pass them explicitly or via the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    environment variables. No-op for single-process runs.
    """
    env_procs = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_procs is not None:
        num_processes = int(env_procs)
    if num_processes in (None, 1) and coordinator_address is None:
        log.debug("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed initialised: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def host_local_batch_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host is responsible for loading.

    With B examples over P processes, host p loads [p·B/P, (p+1)·B/P). The
    engine then assembles the global sharded array with
    ``jax.make_array_from_process_local_data``.
    """
    per_host, remainder = divmod(global_batch_size, jax.process_count())
    if remainder:
        raise ValueError(
            f"global batch {global_batch_size} must divide process count "
            f"{jax.process_count()}"
        )
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_host_local(batch, sharding, batch_axis: int = 0):
    """Assemble a globally-sharded Batch from each host's local examples.

    ``batch`` holds only this host's examples; the result is a global array
    sharded over the mesh's data axis whose addressable shards are this
    host's data — no cross-host transfer happens. ``batch_axis`` selects
    which axis is the per-host batch dimension (the engine's fused-dispatch
    path stacks ``steps_per_execution`` batches ahead of it, giving
    (k, B, ...) leaves with ``batch_axis=1``).
    """
    import numpy as np

    def assemble(leaf):
        local = np.asarray(leaf)
        global_shape = list(local.shape)
        global_shape[batch_axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, local, tuple(global_shape)
        )

    return jax.tree.map(assemble, batch)
