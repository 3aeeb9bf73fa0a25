"""Optical-flow throughput benchmark (secondary headline metric).

Measures Farnebäck frames/sec on the device for a 49-frame HRV super batch —
the unit of work the reference computed on a CPU process pool (notebook 13
cell 7). Prints one JSON line. The baseline is the reference's CPU farm:
OpenCV Farnebäck at ~10 ms/frame-pair single-core on these sizes, ~8 workers
→ ≈800 pairs/s is generous; we record our own C++ single-core rate at run
time as the measured host baseline instead of guessing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _synth_frames(t=49, size=256, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((t, size // 16, size // 16)).astype(np.float32)
    frames = jax.image.resize(jnp.asarray(coarse), (t, size, size), "bilinear")
    return np.asarray(frames * 60 + 120)


def main() -> None:
    import jax

    from predict_pv_yield_tpu.ops.optical_flow import flow_sequence

    frames = _synth_frames()
    t, h, w = frames.shape
    pairs = t - 1

    # device (XLA) rate — frames device-resident across runs (kernel
    # throughput, not tunnel re-upload; bench.py._flow_bench matches)
    import jax.numpy as jnp

    frames_device = jax.device_put(jnp.asarray(frames))
    flows = flow_sequence(frames_device)  # compile + warm
    jax.device_get(flows)
    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        flows = flow_sequence(frames_device)
    jax.device_get(flows)
    device_pairs_per_sec = runs * pairs / (time.perf_counter() - t0)

    # native single-core host rate (the reference's per-worker unit)
    host_pairs_per_sec = None
    try:
        from predict_pv_yield_tpu.native import flow_sequence_native

        t0 = time.perf_counter()
        flow_sequence_native(frames[:9])
        host_pairs_per_sec = 8 / (time.perf_counter() - t0)
    except Exception:
        pass

    result = {
        "metric": f"farneback flow pairs/sec ({h}x{w})",
        "value": round(device_pairs_per_sec, 2),
        "unit": "frame-pairs/s",
        "vs_baseline": (
            round(device_pairs_per_sec / (8 * host_pairs_per_sec), 2)
            if host_pairs_per_sec
            else None
        ),
        "host_single_core_pairs_per_sec": (
            round(host_pairs_per_sec, 2) if host_pairs_per_sec else None
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
