"""Flagship-MFU probe (VERDICT r2 #8): WHERE does the conv3d_sat_nwp step's
time go, and can anything short of widening the model lift MFU 0.30?

Three measured experiments on the real chip, each a jitted forward+backward
(+grad) over the isolated computation, b128 bf16 like the bench headline:

1. ``--mode towers``: the sat tower (24 px, 11→32 ch, 6 layers) and the nwp
   tower (64 px, 10→32 ch, 6 layers) timed separately, with their XLA cost-
   analysis FLOPs → per-tower achieved TFLOP/s and share of the step.
2. ``--mode flags``: the full train step re-timed under candidate XLA flag
   sets (re-exec with XLA_FLAGS: latency-hiding scheduler off, larger scoped
   vmem) — does any scheduler knob move the needle? NOTE: on the dev rig's
   remote-compile tunnel the client build rejects TPU scheduler flags
   (parse_flags_from_env abort), so only ``baseline`` runs there; the mode
   is kept for on-prem hosts with a full TPU client.
(The 128-channel framework-ceiling probe lives in bench.py's round-2
record; ``--mode step`` re-times the full saturated step standalone.)

Usage:  python tools/mfu_probe.py --mode towers
Findings land in PARITY.md (perf table, "MFU probe" row).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = 128
REPEATS = 20


def _peak() -> float:
    from bench import _peak_flops

    return _peak_flops()  # device-kind aware (v4/v5e/v5p/v6e)


def _time_fn(fn, *args):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / REPEATS


def conv_tower_flops(batch, t, h, w, c_in, channels, layers):
    total = 0.0
    for i in range(layers):
        cin = c_in if i == 0 else channels
        h, w = h - 2, w - 2
        m = batch * t * h * w
        total += 2.0 * m * channels * (cin * 27)
    return 3.0 * total  # fwd + bwd(input) + bwd(weights)


def probe_towers() -> None:
    import jax
    import jax.numpy as jnp

    from predict_pv_yield_tpu.models.layers import Conv3dTower

    specs = {
        "sat_tower": dict(t=31, h=24, w=24, c_in=11),
        "nwp_tower": dict(t=4, h=64, w=64, c_in=10),
    }
    peak = _peak()
    results = {}
    for name, spec in specs.items():
        tower = Conv3dTower(channels=32, num_layers=6, pad_time=True,
                            dtype=jnp.bfloat16)
        x = jnp.zeros((BATCH, spec["t"], spec["h"], spec["w"], spec["c_in"]),
                      jnp.bfloat16)
        variables = tower.init(jax.random.key(0), x)

        def loss(params, x):
            return jnp.sum(tower.apply(params, x).astype(jnp.float32))

        step = jax.jit(jax.grad(loss))
        dt = _time_fn(step, variables, x)
        flops = conv_tower_flops(BATCH, spec["t"], spec["h"], spec["w"],
                                 spec["c_in"], 32, 6)
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops_per_s": round(flops / dt / 1e12, 1),
            "mfu": round(flops / dt / peak, 3),
        }
    print(json.dumps({"mode": "towers", "batch": BATCH, **results}))


def probe_step(label: str) -> None:
    """Full saturated train step (the bench headline measurement, fewer
    dispatches) under whatever XLA_FLAGS the caller set."""
    import jax

    from bench import STEPS_PER_EXECUTION, _make_trainer

    trainer, batch = _make_trainer(BATCH)
    device_batch = jax.device_put(
        trainer._maybe_cast(batch.numeric()), trainer._batch_shard
    )
    model = trainer._model

    def multi(state, device_batch):
        def body(s, _):
            return trainer._train_step_body(model, s, device_batch)

        return jax.lax.scan(body, state, None, length=STEPS_PER_EXECUTION)

    multi = jax.jit(multi, donate_argnums=0)
    state = trainer.state
    for _ in range(2):
        state, metrics = multi(state, device_batch)
    jax.device_get(metrics)
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = multi(state, device_batch)
    jax.device_get(metrics)
    dt = time.perf_counter() - t0
    step_ms = dt / (10 * STEPS_PER_EXECUTION) * 1e3
    print(json.dumps({"mode": "step", "label": label,
                      "step_time_ms": round(step_ms, 3)}))


def probe_flags() -> None:
    """Re-exec the full-step probe under candidate XLA flag sets."""
    candidates = {
        "baseline": "",
        "no_latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=false",
        "big_vmem": "--xla_tpu_scoped_vmem_limit_kib=65536",
    }
    for label, flags in candidates.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", "step",
             "--label", label],
            env=env, timeout=900,
            cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
        )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mode", choices=("towers", "flags", "step"),
                        default="towers")
    parser.add_argument("--label", default="baseline")
    args = parser.parse_args()
    if args.mode == "towers":
        probe_towers()
    elif args.mode == "flags":
        probe_flags()
    else:
        probe_step(args.label)


if __name__ == "__main__":
    main()
