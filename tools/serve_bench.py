"""Inference/serving latency benchmark for the flagship model.

The reference has no serving story beyond loading a checkpoint and calling
``forward``; for production deployment the numbers that matter are
per-request latency at small batch and forward throughput at saturation.
This measures the jitted forward (no optimiser) on one chip with the batch
resident in HBM — the device-side cost of a request. The host→HBM transfer
is deliberately excluded and reported as wire bytes instead: on a PCIe host
it is bytes/bandwidth and overlaps with compute under double buffering
(``tools/pipeline_bench.py`` measures that path); on this dev rig requests
reach the chip through a ~35 MB/s tunnel that would swamp the measurement.

Prints one JSON line:

    {"p50_ms_b1": ..., "p99_ms_b1": ..., "throughput_ex_s_b128": ...,
     "wire_mb_b1": ...}

    python tools/serve_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax

    from bench import flagship_configuration, flagship_model
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.parallel.mesh import batch_sharding, mesh_for_batch

    results = {}
    for batch_size, n_requests in ((1, 100), (32, 50), (128, 30)):
        configuration = flagship_configuration(batch_size)
        model = flagship_model(batch_size)
        host = fake_batch(configuration, np.random.default_rng(0)).numeric()
        mesh = mesh_for_batch(batch_size)
        device_batch = jax.device_put(host, batch_sharding(mesh))

        variables = model.init(jax.random.key(0), device_batch)
        apply_fn = jax.jit(model.apply)

        for _ in range(5):  # warm the executable
            out = apply_fn(variables, device_batch)
        jax.device_get(out)

        times = []
        for _ in range(n_requests):
            t0 = time.perf_counter()
            out = apply_fn(variables, device_batch)
            jax.device_get(out)  # full host sync (request completion)
            times.append((time.perf_counter() - t0) * 1e3)
        times = np.asarray(times)

        results[f"p50_ms_b{batch_size}"] = round(float(np.percentile(times, 50)), 2)
        results[f"p99_ms_b{batch_size}"] = round(float(np.percentile(times, 99)), 2)
        n_chips = max(len(jax.devices()), 1)
        results[f"throughput_ex_s_b{batch_size}"] = round(
            batch_size / (np.mean(times) / 1e3), 1
        )
        if n_chips > 1:
            # the batch shards over the mesh: report the per-chip figure
            # too so numbers compare across rigs with different counts
            results[f"throughput_ex_s_chip_b{batch_size}"] = round(
                batch_size / (np.mean(times) / 1e3) / n_chips, 1
            )
        # full numeric batch bytes, INCLUDING the target/yield arrays a
        # serving request would not ship — an upper bound on request size
        # (the conv3d family consumes the whole file batch, so inputs and
        # targets are not separable here without changing the contract)
        wire = sum(
            leaf.nbytes for leaf in jax.tree_util.tree_leaves(host)
        )
        results[f"batch_mb_b{batch_size}"] = round(wire / 1e6, 2)

    results["metric"] = "conv3d_sat_nwp forward latency (HBM-resident, incl. sync)"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
