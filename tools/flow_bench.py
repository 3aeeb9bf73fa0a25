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

from predict_pv_yield_tpu.utils import (
    enable_persistent_compile_cache,
    timed_device_compute,
)

enable_persistent_compile_cache()


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
    jax.device_get(flow_sequence(frames_device))  # compile + warm
    runs = 10
    # timed_device_compute owns the dev-rig sync protocol (device_get sync,
    # min-of-two transfer subtraction, transfer-dominated guard)
    seconds, timing = timed_device_compute(
        lambda: flow_sequence(frames_device), runs
    )
    device_pairs_per_sec = runs * pairs / seconds

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
    if timing["transfer_dominated"]:
        result["transfer_dominated"] = True  # link noise, not kernel time
    print(json.dumps(result))


def sweep() -> None:
    """Flow throughput scaling curve (VERDICT r4 weak #3 / next #4).

    Two axes around the headline operating point (49 frames, 256²):

    * pairs-per-dispatch: 49/97/193 frames at 256² — does batching more
      pairs into one launch amortise fixed dispatch/pyramid cost?
    * frame size at 49 frames: 128², 256², 512², and the nb13 PRODUCTION
      geometry — the full-geo-extent UK HRV window the reference's
      SatelliteLoader computed flow over before cropping (704×548: the
      OCF ``SEVIRI_RSS/OSGB36/all_zarr_int16`` y×x extent; nb13 cells
      9-13 run Farnebäck on the whole extent, one process per pair).

    Prints one JSON line per point: pairs/s, ms/pair, and the per-pixel
    rate (Mpix·pairs/s) that separates gather-bound scaling from fixed
    overhead. Run AFTER bench.py finishes — the points share the chip."""
    import jax
    import jax.numpy as jnp

    from predict_pv_yield_tpu.ops.optical_flow import flow_sequence

    points = [
        {"t": 49, "h": 256, "w": 256, "label": "headline"},
        {"t": 97, "h": 256, "w": 256, "label": "2x pairs"},
        {"t": 193, "h": 256, "w": 256, "label": "4x pairs"},
        {"t": 49, "h": 128, "w": 128, "label": "small frames"},
        {"t": 49, "h": 512, "w": 512, "label": "large frames"},
        {"t": 49, "h": 704, "w": 548, "label": "nb13 production full-geo HRV"},
    ]
    for p in points:
        t, h, w = p["t"], p["h"], p["w"]
        rng = np.random.default_rng(0)
        coarse = rng.standard_normal((t, h // 16, w // 16)).astype(np.float32)
        frames = jax.device_put(
            jax.image.resize(jnp.asarray(coarse), (t, h, w), "bilinear") * 60
            + 120
        )
        jax.device_get(flow_sequence(frames))  # compile + warm
        runs = max(3, int(10 * (49 * 256 * 256) / (t * h * w)))
        # shared dev-rig protocol (utils.timed_device_compute): without the
        # transfer subtraction the low-run large-shape points (up to 148 MB
        # at the nb13 extent) absorb a tunnel transfer the per-pair scaling
        # comparison shouldn't carry
        dt, timing = timed_device_compute(lambda: flow_sequence(frames), runs)
        pairs = t - 1
        rate = runs * pairs / dt
        point = {
            "label": p["label"],
            "frames": t,
            "size": f"{h}x{w}",
            "pairs_per_s": round(rate, 2),
            "ms_per_pair": round(1000.0 / rate, 3),
            "mpix_pairs_per_s": round(rate * h * w / 1e6, 1),
            "runs": runs,
        }
        if timing["transfer_dominated"]:
            point["transfer_dominated"] = True
        print(json.dumps(point))
        sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        sweep()
    else:
        main()
