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
3. ``--mode perceiver``: the perceiver framework-ceiling probe (VERDICT r3
   #3) — the flagship fused train step at production latents (24/24) and at
   MXU-filling widths (128/64, 256/128), FLOPs from XLA cost analysis,
   everything else production-identical. Settles whether the flagship's
   tiny MFU is the latent width or the implementation.
(The 128-channel conv3d framework-ceiling probe lives in bench.py's round-2
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


#: (num_latents, latent_dim, batch): MXU fill depends on latent width, not
#: batch, so the wide probes shrink the batch to keep the unrolled depth's
#: backward activations (folded_batch x latents x 4*latent_dim bf16 per FF,
#: x19 depth) inside v5e HBM — 256/128 at b32 was measured OOM.
PERCEIVER_WIDTHS = ((24, 24, 32), (128, 64, 16), (256, 128, 8))


def _perceiver_trainer(num_latents: int, latent_dim: int, batch: int):
    """The bench perceiver flagship with overridable latent width — identical
    data shapes / depth / stems to the production config, so any MFU delta
    is purely the latent width."""
    from bench import perceiver_configuration
    from predict_pv_yield_tpu.data.fake import fake_batch_on_device
    from predict_pv_yield_tpu.models.perceiver_conv3d_nwp_sat import Model
    from predict_pv_yield_tpu.training.engine import Trainer

    configuration = perceiver_configuration(batch)
    model = Model(
        batch_size=batch,
        history_minutes=60,
        forecast_minutes=30,
        num_latents=num_latents,
        latent_dim=latent_dim,
        embedding_dem=0,
        output_variable="gsp_yield",
        conv3d_channels=8,
        use_future_satellite_images=False,
        depth_unroll=True,  # same form as the bench; also makes the XLA
        # cost analysis correct (a scanned depth loop's body would be
        # counted once, not depth times)
    )
    trainer = Trainer(
        max_epochs=1, profiler=None, precision=16, prefetch_depth=1
    )
    batch_data = fake_batch_on_device(configuration, seed=0)
    trainer.setup(model, batch_data)
    return trainer, batch_data


def _perceiver_flops(num_latents: int, latent_dim: int, batch: int) -> float | None:
    """One training step's FLOPs from XLA cost analysis, lowered on a CPU
    backend in a subprocess (same technique as bench._train_step_flops)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--mode", "perceiver-flops",
         "--latents", str(num_latents), "--latent-dim", str(latent_dim),
         "--batch", str(batch)],
        env=env, capture_output=True, text=True, timeout=2400,
        cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
    )
    for line in result.stdout.splitlines():
        if line.startswith("FLOPS "):
            return float(line.split()[1])
    print(f"WARNING: perceiver FLOPs child rc={result.returncode}; "
          f"stderr tail: {result.stderr[-300:]!r}", file=sys.stderr)
    return None


def _perceiver_flops_main(num_latents: int, latent_dim: int, batch: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    trainer, batch_data = _perceiver_trainer(num_latents, latent_dim, batch)
    device_batch = jax.device_put(
        trainer._maybe_cast(batch_data.numeric()), trainer._batch_shard
    )
    lowered = trainer._compiled["train"].lower(trainer.state, device_batch)
    # Pre-compile HLO cost analysis (same rationale as bench._flops_main):
    # within 1% of post-compile and avoids a tens-of-minutes CPU compile of
    # the depth-unrolled wide-latent programs.
    analysis = None
    try:
        analysis = lowered.cost_analysis()
    except Exception:
        pass
    if not analysis or not float(
        (analysis[0] if isinstance(analysis, (list, tuple)) else analysis).get(
            "flops", 0.0
        )
    ):
        analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    print(f"FLOPS {float(analysis['flops'])}")


def probe_perceiver(widths: str = "") -> None:
    """Perceiver framework-ceiling probe (VERDICT r3 #3): is the flagship's
    tiny MFU the 24-wide production latents padding to a sliver of the
    128-wide MXU, or the attention/scan implementation? Same fused train
    step, three latent widths, everything else production-identical.

    ``widths``: optional comma-separated ``latents x dim x batch`` filter
    (e.g. ``"256x128x8"``) so each width can run in its own bounded
    invocation — the wide-latent compiles are minutes each on the dev rig's
    remote-compile tunnel, and one process running all three can outlive a
    driver timeout."""
    import jax

    from bench import STEPS_PER_EXECUTION

    selected = PERCEIVER_WIDTHS
    if widths:
        wanted = {
            tuple(int(p) for p in w.strip().split("x"))
            for w in widths.split(",")
        }
        selected = tuple(w for w in PERCEIVER_WIDTHS if w in wanted)
        unknown = wanted - set(PERCEIVER_WIDTHS)
        if unknown or not selected:
            # A typo'd width must error, not print an empty success artifact
            # the driver would record as a pass.
            raise SystemExit(
                f"--widths entries {sorted(unknown)} match no PERCEIVER_WIDTHS "
                f"row; valid: {['x'.join(map(str, w)) for w in PERCEIVER_WIDTHS]}"
            )

    peak = _peak()
    results = {}
    for num_latents, latent_dim, batch_size in selected:
        key = f"latents_{num_latents}x{latent_dim}_b{batch_size}"
        try:
            trainer, batch = _perceiver_trainer(
                num_latents, latent_dim, batch_size
            )
            device_batch = jax.device_put(
                trainer._maybe_cast(batch.numeric()), trainer._batch_shard
            )
            model = trainer._model

            def multi(state, device_batch):
                def body(s, _):
                    return trainer._train_step_body(model, s, device_batch)

                return jax.lax.scan(
                    body, state, None, length=STEPS_PER_EXECUTION
                )

            multi = jax.jit(multi, donate_argnums=0)
            state = trainer.state
            for _ in range(2):
                state, metrics = multi(state, device_batch)
            jax.device_get(metrics)
            t0 = time.perf_counter()
            for _ in range(10):
                state, metrics = multi(state, device_batch)
            jax.device_get(metrics)
            dt = (time.perf_counter() - t0) / (10 * STEPS_PER_EXECUTION)
        except Exception as exc:  # e.g. RESOURCE_EXHAUSTED on small HBM
            results[key] = {"error": str(exc).splitlines()[0][:200]}
            continue

        flops = _perceiver_flops(num_latents, latent_dim, batch_size)
        results[key] = {
            "step_time_ms": round(dt * 1e3, 3),
            "examples_per_s": round(batch_size / dt, 1),
            "step_tflops": round(flops / 1e12, 4) if flops else None,
            "mfu": round(flops / dt / peak, 4) if flops else None,
        }
    print(json.dumps({"mode": "perceiver", **results}))


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
    parser.add_argument(
        "--mode",
        choices=("towers", "flags", "step", "perceiver", "perceiver-flops"),
        default="towers",
    )
    parser.add_argument("--label", default="baseline")
    parser.add_argument("--latents", type=int, default=24)
    parser.add_argument("--latent-dim", type=int, default=24)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--widths", default="", help="latentsxdimxbatch,... filter for --mode perceiver")
    args = parser.parse_args()
    if args.mode == "towers":
        probe_towers()
    elif args.mode == "flags":
        probe_flags()
    elif args.mode == "perceiver":
        probe_perceiver(args.widths)
    elif args.mode == "perceiver-flops":
        _perceiver_flops_main(args.latents, args.latent_dim, args.batch)
    else:
        probe_step(args.label)


if __name__ == "__main__":
    main()
