"""Headline benchmark: conv3d_sat_nwp training throughput on one TPU chip.

Prints exactly one JSON line:

    {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N/B,
     "step_time_ms": ..., "mfu": ..., "batch_size": ..., "steps_per_execution": ...,
     "b32_single_dispatch_batches_per_s": ...,
     "perceiver_conv3d_sat_nwp_examples_per_s": ...,  # the reference's best
     "perceiver_step_time_ms": ..., "perceiver_vs_baseline": ...,  # model at
     "perceiver_mfu": ...,                     # its production config (b32)
     "flow_pairs_per_s": ..., "flow_frame_size": 256,   # Farnebäck on-device
     "flow_host_single_core_pairs_per_s": ...,          # native C++ baseline
     "flow_vs_cpu_farm": ...,                  # device vs single-core × 8 farm
     "netcdf_host_batches_per_s": ...,  # host pipeline on the reference's
     "netcdf_host_f16wire_batches_per_s": ...,  # opt-in f16 wire variant
     "host_vs_device_b32": ...}         # real v15 format vs device step rate

``BENCH_SMOKE=1`` runs the identical code path at tiny shapes on whatever
backend is active (adds ``"smoke": true`` to the line so the artifact can
never be mistaken for a real measurement) — executed by
``tests/test_driver_contracts.py`` and CI so this driver-facing script
cannot ship broken (the round-3 lesson). The smoke flag only shrinks
bench.py's OWN run: the model/configuration builders other tools import
(``tools/serve_bench.py``, ``tools/pipeline_bench.py``, ``tools/
mfu_probe.py``, ``__graft_entry__.py``) take an explicit ``smoke=``
parameter defaulting to production shapes, so a leftover BENCH_SMOKE in
the environment can never silently relabel a toy model as the flagship.

Setup mirrors the reference's flagship training run (``configs/model/
conv3d_sat_nwp.yaml``: 24 px satellite, 11 channels, 6 conv layers, 30 min
history, 120 min forecast, GSP target; reference
``configs/experiment/conv3d_sat_nwp.yaml``). The measured quantity is full
training steps (forward + backward + Adam update) per second with bf16
activations, batches resident in HBM so host IO is excluded — the
pure-compute ceiling the input pipeline must keep fed.

Two configurations are reported:

* the SATURATED headline — batch 128 with ``steps_per_execution=8`` (eight
  optimiser steps fused into one dispatch via lax.scan, the engine feature
  that removes the host dispatch-latency bound measured in round 1:
  near-flat step time from b32 to b128 meant the chip was mostly idle at
  b32). Reported as examples/s/chip with the device step time and an MFU
  estimate (step FLOPs from XLA cost analysis / v5e bf16 peak).
* the b32 single-dispatch rate (round-1 continuity metric).

Why MFU ≈ 0.30 is close to this architecture's ceiling: the FLOPs live in
Conv3d layers with 32 output channels, which lower to implicit GEMMs whose N
dimension is 32 — a quarter of the 128-wide MXU — capping those layers near
25% utilisation no matter the schedule; the K dimension (Cin·k³ ≈ 864) and
the wider FC layers pull the blend up to ~30%. Raising MFU further would
mean changing the model (more channels), not the compiler schedule —
measured directly: the SAME training-step code with conv3d_channels=128
reaches MFU 0.693 (PARITY.md perf table, framework-ceiling probe).

Baseline ``B``: the reference's lab notes record "about 4 minutes to run the
validation epoch" for its conv3d runs on a GCP GPU with 1000 validation
batches of 32 (reference ``experiments/2021-09/2021-09-27/experiments.txt``,
``configs/datamodule/netcdf_datamodule_gcp.yaml: n_val_data=1000``) →
≈4.2 *inference* batches/s = 134.4 examples/s. Comparing our *training*
steps against their inference rate is conservative against us: training is
≈3× the FLOPs of inference.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax

BASELINE_EXAMPLES_PER_SEC = 4.2 * 32
PERCEIVER_BASELINE_EXAMPLES_PER_SEC = 24900 * 32 / (4 * 3600.0)  # ≈55.3

#: BENCH_SMOKE=1 shrinks every dimension so the WHOLE main() path (both
#: trainers, the fused-scan dispatch loops, the FLOPs subprocess, and the
#: flow measurement) executes in seconds on the CPU backend. It exists so a
#: pytest/CI gate can execute this driver-facing script end-to-end — the
#: round-3 BENCH artifact was lost to a crash no test could see because
#: nothing ever ran bench.py (VERDICT r3 #1).
SMOKE = os.environ.get("BENCH_SMOKE", "") == "1"

from predict_pv_yield_tpu.utils import timed_device_compute

if SMOKE:
    # Same persistent compile cache the test suite uses (tests/conftest.py):
    # the smoke gate's cost is pure XLA CPU compiles, all identical
    # run-to-run, so warm gate runs skip them. Real bench runs are
    # deliberately untouched.
    from predict_pv_yield_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

#: Production steps/dispatch. Importers (tools/mfu_probe.py) rely on this
#: being the real value regardless of BENCH_SMOKE; bench.py's own run uses
#: _RUN_STEPS_PER_EXECUTION below.
STEPS_PER_EXECUTION = 8

SATURATED_BATCH = 4 if SMOKE else 128
_RUN_STEPS_PER_EXECUTION = 2 if SMOKE else STEPS_PER_EXECUTION
# smoke needs 2 warmups: the post-step param layout triggers one more
# compile on the second dispatch, which must not land in the measurement
WARMUP_DISPATCHES = 2 if SMOKE else 3
MEASURE_DISPATCHES = 1 if SMOKE else 25
B32_BATCH = 2 if SMOKE else 32
B32_MEASURE_STEPS = 2 if SMOKE else 200
PERCEIVER_BATCH = 2 if SMOKE else 32
FLOW_FRAMES = 5 if SMOKE else 49
FLOW_SIZE = 64 if SMOKE else 256
FLOW_RUNS = 1 if SMOKE else 10
HOST_SHARDS = 2 if SMOKE else 24
HOST_STEPS = 2 if SMOKE else 96

# bf16 peak FLOP/s per chip by device kind (dense MXU). Keys are matched
# against the normalised (lowercased, space-stripped) jax device_kind —
# e.g. "TPU v5 lite" -> "tpuv5lite", "TPU v4" -> "tpuv4".
_PEAK_FLOPS = {
    "v5litepod": 197e12,
    "v5lite": 197e12,   # v5e reports device_kind "TPU v5 lite"
    "v5e": 197e12,
    "v6lite": 918e12,   # v6e / Trillium
    "v6e": 918e12,
    "v5p": 459e12,
    "v5": 459e12,       # after the lite forms: bare "v5" is v5p
    "v4": 275e12,
}
_DEFAULT_PEAK = 197e12  # this rig is a v5e


def flagship_configuration(batch_size: int = 32, smoke: bool = False):
    from predict_pv_yield_tpu.config.dataset import Configuration

    configuration = Configuration()
    configuration.process.batch_size = batch_size
    configuration.input_data.default_history_minutes = 30
    configuration.input_data.default_forecast_minutes = 120
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = (
        12 if smoke else 24
    )
    configuration.input_data.nwp.nwp_image_size_pixels = 12 if smoke else 64
    return configuration


def flagship_model(batch_size: int = 32, smoke: bool = False):
    from predict_pv_yield_tpu.models.conv3d_sat_nwp import Model

    # configs/model/conv3d_sat_nwp.yaml hyperparameters; batch_size threads
    # the reference's [0:batch_size] slicing quirk (base_model.py:30).
    return Model(
        batch_size=batch_size,
        include_pv_or_gsp_yield_history=True,
        include_nwp=True,
        forecast_minutes=120,
        history_minutes=30,
        number_of_conv3d_layers=2 if smoke else 6,
        image_size_pixels=12 if smoke else 24,
        nwp_image_size_pixels=12 if smoke else 64,
        number_sat_channels=11,
        number_nwp_channels=10,
        conv3d_channels=8 if smoke else 32,
        fc1_output_features=16 if smoke else 128,
        fc2_output_features=16 if smoke else 128,
        fc3_output_features=16 if smoke else 64,
        output_variable="gsp_yield",
        include_pv_yield_history=False,
        include_future_satellite=True,
    )


def perceiver_configuration(batch_size: int = 32, smoke: bool = False):
    """The reference's perceiver production data shapes: 64 px satellite AND
    NWP grids (reference ``perceiver_conv3d_nwp_sat.py:23`` params), history
    60 / forecast 30 (reference ``configs/model/perceiver_conv3d_sat_nwp.yaml``)."""
    from predict_pv_yield_tpu.config.dataset import Configuration

    configuration = Configuration()
    configuration.process.batch_size = batch_size
    configuration.input_data.default_history_minutes = 30 if smoke else 60
    configuration.input_data.default_forecast_minutes = 30
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = (
        8 if smoke else 64
    )
    configuration.input_data.nwp.nwp_image_size_pixels = 8 if smoke else 64
    return configuration


def perceiver_flagship_model(batch_size: int = 32, smoke: bool = False):
    """The reference's best model (0.0308 MAE) at its production
    hyperparameters: ``configs/model/perceiver_conv3d_sat_nwp.yaml`` —
    latents 24/24 ("batch 32 fits at latents 24/24",
    reference ``experiments/2021-09/2021-09-28/experiments.txt:15-38``)."""
    from predict_pv_yield_tpu.models.perceiver_conv3d_nwp_sat import Model

    return Model(
        batch_size=batch_size,
        history_minutes=30 if smoke else 60,
        forecast_minutes=30,
        num_latents=4 if smoke else 24,
        latent_dim=8 if smoke else 24,
        embedding_dem=0,
        output_variable="gsp_yield",
        conv3d_channels=4 if smoke else 8,
        use_future_satellite_images=False,
        # measured 104.3 -> 75.3 ms/step: unrolling the tied depth loop lets
        # XLA CSE hoist the loop-invariant cross-attention K/V projections
        # that lax.scan recomputes every iteration (PARITY.md). Smoke keeps
        # the scanned form — unrolling only slows the CPU compile.
        depth_unroll=not smoke,
    )


def _make_trainer(batch_size: int, steps_per_execution: int = 1,
                  family: str = "conv3d", smoke: bool = False):
    from predict_pv_yield_tpu.data.fake import fake_batch_on_device
    from predict_pv_yield_tpu.training.engine import Trainer

    if family == "perceiver":
        configuration = perceiver_configuration(batch_size, smoke=smoke)
        model = perceiver_flagship_model(batch_size, smoke=smoke)
    else:
        configuration = flagship_configuration(batch_size, smoke=smoke)
        model = flagship_model(batch_size, smoke=smoke)
    trainer = Trainer(
        max_epochs=1, profiler=None, precision=16, prefetch_depth=1,
        steps_per_execution=steps_per_execution,
    )
    batch = fake_batch_on_device(configuration, seed=0)
    trainer.setup(model, batch)
    return trainer, batch


def _train_step_flops(batch_size: int, family: str = "conv3d") -> float | None:
    """FLOPs of ONE training step, from XLA cost analysis lowered on a CPU
    backend in a subprocess (the HLO FLOP count is platform-independent; the
    remote-compiled TPU executable does not expose cost analysis here)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        result = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flops", str(batch_size),
             family],
            env=env, capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        # a slow CPU lowering (e.g. the unrolled perceiver on a small host)
        # must degrade to mfu=null, not kill the whole benchmark
        return None
    for line in result.stdout.splitlines():
        if line.startswith("FLOPS "):
            return float(line.split()[1])
    # a crashed child (import error, OOM in the CPU lowering) must be
    # distinguishable from the legitimate slow-host timeout above
    print(
        f"WARNING: FLOPs subprocess exited {result.returncode} with no "
        f"FLOPS line; stderr tail: {result.stderr[-400:]!r}",
        file=sys.stderr,
    )
    return None


def _flops_main(batch_size: int, family: str = "conv3d") -> None:
    jax.config.update("jax_platforms", "cpu")
    trainer, batch = _make_trainer(batch_size, family=family, smoke=SMOKE)
    device_batch = jax.device_put(
        trainer._maybe_cast(batch.numeric()), trainer._batch_shard
    )
    lowered = trainer._compiled["train"].lower(trainer.state, device_batch)
    # Pre-compile HLO cost analysis: within 1% of the post-compile count
    # (measured conv3d b128: 2.143 vs 2.163 TF) and skips the CPU backend
    # compile, which for the depth-unrolled perceiver program takes tens of
    # minutes on a 1-core host — longer than this child's own timeout.
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


def _peak_flops() -> float:
    kind = str(jax.devices()[0].device_kind).lower().replace(" ", "").replace("-", "")
    for key, value in _PEAK_FLOPS.items():  # ordered: lite forms first
        if key in kind:
            return value
    # an unknown device would otherwise get a confidently wrong MFU
    print(
        f"WARNING: unknown device kind {kind!r}; assuming v5e peak "
        f"{_DEFAULT_PEAK:.3g} FLOP/s for the MFU estimate",
        file=sys.stderr,
    )
    return _DEFAULT_PEAK


def _flow_bench() -> dict:
    """Optical-flow throughput — BASELINE.json's second headline metric,
    recorded in the driver artifact for the first time this round (VERDICT
    r3 #2). Farnebäck frame-pairs/s on-device for an HRV super-batch
    sequence (the unit of work of the reference's CPU process farm,
    notebook 13 cell 7), with the baseline measured live: our native C++
    single-core pair rate × 8 workers, the farm the reference ran."""
    import jax.numpy as jnp
    import numpy as np

    from predict_pv_yield_tpu.ops.optical_flow import flow_sequence

    rng = np.random.default_rng(0)
    coarse = rng.standard_normal(
        (FLOW_FRAMES, FLOW_SIZE // 16, FLOW_SIZE // 16)
    ).astype(np.float32)
    frames = np.asarray(
        jax.image.resize(
            jnp.asarray(coarse), (FLOW_FRAMES, FLOW_SIZE, FLOW_SIZE), "bilinear"
        )
        * 60
        + 120
    )
    pairs = FLOW_FRAMES - 1

    # frames stay device-resident across timed runs: the measured quantity
    # is kernel throughput (the reference farm holds frames in RAM too);
    # re-uploading 12.8 MB per call through the dev rig's ~35 MB/s tunnel
    # was costing ~25% of the measured rate
    frames_device = jax.device_put(jnp.asarray(frames))
    jax.device_get(flow_sequence(frames_device))  # compile + warm
    # timed_device_compute owns the dev-rig sync protocol (device_get sync,
    # min-of-two transfer subtraction, transfer-dominated guard)
    seconds, flow_timing = timed_device_compute(
        lambda: flow_sequence(frames_device), FLOW_RUNS
    )
    device_rate = FLOW_RUNS * pairs / seconds

    host_rate = None
    try:
        from predict_pv_yield_tpu.native import flow_sequence_native

        host_frames = frames[: min(9, FLOW_FRAMES)]
        t0 = time.perf_counter()
        flow_sequence_native(host_frames)
        host_rate = (host_frames.shape[0] - 1) / (time.perf_counter() - t0)
    except Exception as exc:  # native kernels disabled → flow keys go null
        print(f"WARNING: native flow baseline unavailable: {exc}", file=sys.stderr)

    out = {
        "flow_pairs_per_s": round(device_rate, 2),
        "flow_frame_size": FLOW_SIZE,
        "flow_host_single_core_pairs_per_s": (
            round(host_rate, 2) if host_rate else None
        ),
        "flow_vs_cpu_farm": (
            round(device_rate / (8 * host_rate), 3) if host_rate else None
        ),
    }
    if flow_timing["transfer_dominated"]:
        out["flow_transfer_dominated"] = True  # link noise, not kernel time
    return out


def _contended(cpu_frac: float, threshold: float = 0.75) -> bool:
    """True when this process failed to claim at least ``threshold`` of one
    core over a nominally CPU-saturated timed loop — i.e. something else is
    on the rig and the host-side number is depressed. The threshold is per
    single core, so it holds on any core count (healthy saturated legs
    measure ~1.0 on the 1-core dev rig, >1 on multi-core)."""
    return cpu_frac < threshold


def _learning_gate_bench() -> dict:
    """End-to-end learning proof in the driver artifact (VERDICT r4 #1):
    train the conv3d flagship on the learnable synthetic archive
    (``data/synthetic.py`` — yield is a deterministic function of satellite
    brightness) through the real compose→``train()`` pipeline ON THIS
    DEVICE, and report the trained validation NMAE next to the last-value
    persistence baseline's on the same held-out split. The reference's
    reason to exist is ``trained < baseline`` (conv3d MAE 0.0401 vs 0.0562,
    reference experiments/2021-09/2021-09-24/experiments.txt:12-17); these
    two keys show the native framework doing the same thing, measured fresh
    every round. The in-suite CPU gate (tests/test_learning_gate.py) asserts
    the margin; smoke mode here shrinks the run so the driver-contract test
    stays fast.

    The override blocks and the compose→train runner are single-sourced in
    ``data/synthetic.py`` and shared with the in-suite gate — the artifact
    measures exactly the model tests/test_learning_gate.py asserts on."""
    import shutil
    import tempfile

    from predict_pv_yield_tpu.data.synthetic import (
        BASELINE_GATE_OVERRIDES,
        CONV3D_GATE_OVERRIDES,
        make_learnable_archive,
        run_learnable,
    )

    root = tempfile.mkdtemp(prefix="bench_learn_")
    try:
        arch = make_learnable_archive(
            root, n_frames=96 if SMOKE else 288, px=24, n_gsp=4, seed=0
        )

        def run(overrides):
            return run_learnable(
                arch,
                overrides,
                workdir=tempfile.mkdtemp(prefix="run_", dir=root),
            )

        trained = run(
            CONV3D_GATE_OVERRIDES
            + [f"trainer.max_epochs={1 if SMOKE else 4}"]
        )
        baseline = run(BASELINE_GATE_OVERRIDES)
        return {
            "trained_nmae": round(trained, 4),
            "baseline_nmae": round(baseline, 4),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _host_pipeline_bench(b32_device_rate: float | None) -> dict:
    """Host input-pipeline rate on the reference's real v15 NetCDF batch
    format — the SURVEY north-star gate (host rate >= device step rate) in
    the driver artifact itself, not just PARITY prose (VERDICT r3 weak #6).

    Writes HOST_SHARDS per-source NetCDF batch files (h5netcdf conventions,
    ``data/netcdf_writer.py``) to a tmpfs dir, then measures threaded
    read -> schema-cached mmap decode -> host prep, everything up to the
    device_put boundary — the same path ``tools/pipeline_bench.py --format
    netcdf --host-only`` measures at full scale.

    Two operating points, matching the Trainer's two wire configs:

    * ``netcdf_host_batches_per_s`` — the DEFAULT production wire
      (``wire_float16=False``): float32 leaves ship as-is and narrow inside
      the jitted step on device (engine ``_maybe_cast`` docstring records
      why — a host-side cast was the measured e2e bottleneck). Every leaf
      is page-touched (1 byte / 4 KiB) so lazy mmap views are charged their
      page-fault cost. This is the host >= device gate.
    * ``netcdf_host_f16wire_batches_per_s`` — the opt-in f16 wire
      (``wire_float16=True``, halves transfer bytes for bandwidth-starved
      links like this dev rig's remote tunnel). The f32->f16 cast rides in
      the loader WORKER threads (``Trainer._offload_wire_cast`` — the real
      training path), so on multi-core hosts it parallelises and overlaps;
      on a 1-core rig it still costs serial CPU and can fall BELOW the
      device rate — reported so the artifact is honest about that trade,
      and ``wire_float16="auto"`` exists so no user trips it blind.

    Both legs defend their own validity (VERDICT r4 weak #6): each records
    the fraction of one core THIS process actually held during the timed
    loop (``time.process_time()/wall``). A nominally CPU-saturated host
    measurement that can't claim ~a full core is sharing the rig with a
    stale process (the round-4 lesson — a leftover test run silently
    depressed the validation numbers); such a leg is re-run once and, if
    still contended, flagged ``host_load_contaminated``."""
    import shutil
    import tempfile

    import numpy as np

    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.loader import PrefetchingLoader
    from predict_pv_yield_tpu.data.netcdf_reader import NetCDFBatchDataset
    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch
    from predict_pv_yield_tpu.training.engine import Trainer

    def _touch_pages(numeric) -> None:
        # mmap-backed leaves defer byte flow to the consumer; fault every
        # page in (what device_put will do) to keep the rate honest
        for leaf in jax.tree_util.tree_leaves(numeric):
            if isinstance(leaf, np.ndarray) and leaf.nbytes:
                flat = (
                    leaf.reshape(-1).view(np.uint8)
                    if leaf.flags["C_CONTIGUOUS"]
                    else np.ascontiguousarray(leaf).reshape(-1).view(np.uint8)
                )
                int(flat[::4096].sum())

    configuration = flagship_configuration(B32_BATCH, smoke=SMOKE)
    directory = tempfile.mkdtemp(
        prefix="bench_netcdf_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        for i in range(HOST_SHARDS):
            rng = np.random.default_rng(i)
            batch = fake_batch(configuration, rng)
            raw = rng.integers(
                -1, 1023, size=batch.satellite.data.shape, dtype=np.int16
            )
            batch = batch.replace(satellite=batch.satellite.replace(data=raw))
            write_v15_batch(directory, i, batch)

        dataset = NetCDFBatchDataset(HOST_SHARDS, directory)
        loader = PrefetchingLoader(
            dataset, num_workers=8, prefetch_factor=8, shuffle=True
        )
        for batch in loader:  # warm page cache + thread pool + schema cache
            break

        rates = {}
        cpu_fracs = {}
        for label, wire_f16 in (("default", False), ("f16wire", True)):
            trainer = Trainer(
                max_epochs=1, profiler=None, precision=16,
                wire_float16=wire_f16,
            )
            # the REAL training path: an f16 wire casts in the loader's
            # worker threads, not on this consumer thread
            trainer._offload_wire_cast(loader)

            def leg():
                count = 0
                t0 = time.perf_counter()
                c0 = time.process_time()
                while count < HOST_STEPS:
                    for batch in loader:
                        prepared = trainer._wire_cast(
                            trainer._maybe_cast(batch.numeric())
                        )
                        _touch_pages(prepared)
                        count += 1
                        if count >= HOST_STEPS:
                            break
                wall = time.perf_counter() - t0
                return count / wall, (time.process_time() - c0) / wall

            rate, cpu_frac = leg()
            if _contended(cpu_frac):  # rig shared with a stale process:
                rate2, frac2 = leg()  # one retry, keep the better run
                if rate2 > rate:
                    rate, cpu_frac = rate2, frac2
            rates[label] = rate
            cpu_fracs[label] = cpu_frac
        loader.transform = None
    finally:
        shutil.rmtree(directory, ignore_errors=True)

    return {
        "netcdf_host_batches_per_s": round(rates["default"], 1),
        "netcdf_host_f16wire_batches_per_s": round(rates["f16wire"], 1),
        "host_vs_device_b32": (
            round(rates["default"] / b32_device_rate, 2)
            if b32_device_rate
            else None
        ),
        "host_cpu_frac": round(cpu_fracs["default"], 2),
        "host_load_contaminated": any(map(_contended, cpu_fracs.values())),
    }


def main() -> None:
    load_1m_at_start = os.getloadavg()[0]  # pre-existing rig load, before
    # our own device legs inflate it — context for the host-side keys

    # ---- saturated headline: b128, 8 fused steps per dispatch ----------
    trainer, batch = _make_trainer(SATURATED_BATCH, smoke=SMOKE)
    device_batch128 = jax.device_put(
        trainer._maybe_cast(batch.numeric()), trainer._batch_shard
    )
    model = trainer._model

    # Same scanned program as the engine's steps_per_execution path, but the
    # resident batch is reused across scan iterations (xs=None) so the
    # measurement is pure step compute + dispatch — no batch-copy traffic.
    def multi(state, device_batch):
        def body(s, _):
            return trainer._train_step_body(model, s, device_batch)

        return jax.lax.scan(body, state, None, length=_RUN_STEPS_PER_EXECUTION)

    multi = jax.jit(multi, donate_argnums=0)
    state = trainer.state

    for _ in range(WARMUP_DISPATCHES):
        state, metrics = multi(state, device_batch128)
    jax.device_get(metrics)  # full host sync (block_until_ready alone can
    # return early through the remote-execution tunnel)

    t0 = time.perf_counter()
    for _ in range(MEASURE_DISPATCHES):
        state, metrics = multi(state, device_batch128)
    jax.device_get(metrics)
    dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    steps = MEASURE_DISPATCHES * _RUN_STEPS_PER_EXECUTION
    step_time_ms = dt / steps * 1000.0
    examples_per_sec = steps * SATURATED_BATCH / dt / n_chips

    flops = _train_step_flops(SATURATED_BATCH)
    mfu = None
    if flops:
        mfu = round(flops * (steps / dt) / (_peak_flops() * n_chips), 4)

    # ---- perceiver flagship (VERDICT r2 #2): the reference's best model ----
    # Baseline: ≈4 h/epoch at batch 32 on a P100 over the GCP set's 24900
    # batches (experiments/2021-09/2021-09-28/experiments.txt:15-38 +
    # configs/datamodule/netcdf_datamodule_gcp.yaml) → 1.73 batches/s
    # → 55.3 examples/s.
    perceiver_trainer, perceiver_batch = _make_trainer(
        PERCEIVER_BATCH, family="perceiver", smoke=SMOKE
    )
    perceiver_device_batch = jax.device_put(
        perceiver_trainer._maybe_cast(perceiver_batch.numeric()),
        perceiver_trainer._batch_shard,
    )
    perceiver_model = perceiver_trainer._model

    def perceiver_multi(state, device_batch):
        def body(s, _):
            return perceiver_trainer._train_step_body(perceiver_model, s, device_batch)

        return jax.lax.scan(body, state, None, length=_RUN_STEPS_PER_EXECUTION)

    perceiver_multi = jax.jit(perceiver_multi, donate_argnums=0)
    pstate = perceiver_trainer.state
    for _ in range(WARMUP_DISPATCHES):
        pstate, pmetrics = perceiver_multi(pstate, perceiver_device_batch)
    jax.device_get(pmetrics)
    t0 = time.perf_counter()
    for _ in range(MEASURE_DISPATCHES):
        pstate, pmetrics = perceiver_multi(pstate, perceiver_device_batch)
    jax.device_get(pmetrics)
    pdt = time.perf_counter() - t0
    psteps = MEASURE_DISPATCHES * _RUN_STEPS_PER_EXECUTION
    perceiver_examples_per_sec = psteps * PERCEIVER_BATCH / pdt / n_chips
    perceiver_step_ms = pdt / psteps * 1000.0
    # smoke covers the FLOPs-subprocess mechanics once (conv3d above);
    # a second full CPU lowering would only add minutes to the gate
    pflops = (
        None if SMOKE else _train_step_flops(PERCEIVER_BATCH, family="perceiver")
    )
    perceiver_mfu = None
    if pflops:
        perceiver_mfu = round(
            pflops * (psteps / pdt) / (_peak_flops() * n_chips), 4
        )

    # ---- b32 single-dispatch continuity metric --------------------------
    trainer32, batch32 = _make_trainer(B32_BATCH, smoke=SMOKE)
    device_batch = jax.device_put(
        trainer32._maybe_cast(batch32.numeric()), trainer32._batch_shard
    )
    step = trainer32._compiled["train"]
    state32 = trainer32.state
    for _ in range(10):
        state32, metrics32 = step(state32, device_batch)
    jax.device_get(metrics32)
    t0 = time.perf_counter()
    for _ in range(B32_MEASURE_STEPS):
        state32, metrics32 = step(state32, device_batch)
    jax.device_get(metrics32)
    b32_rate = B32_MEASURE_STEPS / (time.perf_counter() - t0) / n_chips

    # ---- what would wire_float16="auto" pick on this rig? ----------------
    wire_auto = trainer32._resolve_wire_auto(batch32)

    # ---- optical-flow headline (BASELINE.json metric #2) -----------------
    flow = _flow_bench()

    # ---- host >= device gate on the real v15 NetCDF format ---------------
    host = _host_pipeline_bench(b32_rate)

    # ---- end-to-end learning gate: trained model beats persistence -------
    learn = _learning_gate_bench()

    print(
        json.dumps(
            {
                **({"smoke": True} if SMOKE else {}),
                "metric": (
                    "conv3d_sat_nwp train examples/s/chip "
                    f"(saturated: b{SATURATED_BATCH}, bf16, "
                    f"{_RUN_STEPS_PER_EXECUTION} steps/dispatch)"
                ),
                "value": round(examples_per_sec, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
                "step_time_ms": round(step_time_ms, 3),
                "mfu": mfu,
                "batch_size": SATURATED_BATCH,
                "steps_per_execution": _RUN_STEPS_PER_EXECUTION,
                "b32_single_dispatch_batches_per_s": round(b32_rate, 3),
                "perceiver_conv3d_sat_nwp_examples_per_s": round(
                    perceiver_examples_per_sec, 1
                ),
                "perceiver_step_time_ms": round(perceiver_step_ms, 3),
                "perceiver_vs_baseline": round(
                    perceiver_examples_per_sec / PERCEIVER_BASELINE_EXAMPLES_PER_SEC, 3
                ),
                "perceiver_mfu": perceiver_mfu,
                # vs_baseline divides by the 2021 lab-note GCP GPU rate
                # (134.4 ex/s, P100-class) — NOT the >=5x-A100 north star,
                # which no hardware here can measure; PARITY.md "A100 north
                # star" records the bounded argument both ways.
                "vs_baseline_basis": "2021 GCP lab-note rate (P100-class)",
                "wire_f16_auto_selected": wire_auto,
                "host_load_1m_at_start": round(load_1m_at_start, 2),
                **flow,
                **host,
                **learn,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--flops":
        _flops_main(int(sys.argv[2]),
                    sys.argv[3] if len(sys.argv) > 3 else "conv3d")
    else:
        main()
