"""End-to-end input-pipeline benchmark.

`bench.py` measures the pure-compute train-step ceiling with batches
synthesised in HBM. This tool answers the follow-up question — can the host
pipeline keep the chip fed? It prepares a shard dataset (int16 satellite,
the native wire format), then times a real ``Trainer.fit`` epoch: threaded
shard decode → async ``device_put`` double buffer → fused on-device int16
decode → train step. Prints one JSON line with the sustained
batches/sec/chip *including* the data path.

    python tools/pipeline_bench.py --shards 64 --steps 60

Recorded on the development rig (v5e behind a remote-execution tunnel),
round 2, raw-format shards on local tmpfs:

* ``--host-only --wire int16``: **294.7 batches/s** (15.0 GB/s through the
  host path: mmap shard views + page-touch; 50.9 MB/batch wire) — 8.3× the
  35.4 batches/s device step rate, so the host pipeline satisfies the
  SURVEY north-star gate (host ≥ device) with wide margin.
* ``--host-only --wire f32`` (the reference's host-side decode+normalise,
  netcdf_dataset.py:96-101): 63.8 batches/s and 63.5 MB/batch — the int16
  wire + fused on-device decode is 4.6× faster on the host AND ships fewer
  bytes; this is the measured case for the north-star design.
* end-to-end on this rig: 1.64 batches/s — bounded by the tunnel's
  ~35 MB/s host→device upload (each fresh batch re-uploads at execution
  time), not the framework. On production TPU hosts (direct PCIe DMA,
  >10 GB/s) the measured host rate makes the same path compute-bound.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build_zarr_stream(directory: str, args):
    """Synthetic production-shaped archives + the live-streaming datamodule
    (VERDICT r3 #4): 2 days of 5-min 11-channel int16 satellite on a 64px
    OSGB grid, a UKV-axis-order NWP run archive (10 variables, 3-hourly
    inits, hourly steps, 80px grid), a PVLive GSP CSV and Passiv PV
    power+metadata CSVs — every input group the flagship consumes, sampled
    live per batch through data/sources.py (window sampling, freshest-NWP-
    run selection, location-driven crops, collation)."""
    import pandas as pd

    from predict_pv_yield_tpu.data.loader import ZarrStreamDataModule
    from predict_pv_yield_tpu.data.zarr_reader import write_zarr

    root = os.path.join(directory, "archive")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)

    n_frames, grid, n_ch = 576, 64, 11
    t0 = np.datetime64("2020-06-01T00:00", "ns")
    times = t0 + np.arange(n_frames) * np.timedelta64(5, "m")
    frames = rng.integers(
        -1, 1023, size=(n_frames, n_ch, grid, grid)
    ).astype(np.int16)
    sat = os.path.join(root, "sat.zarr")
    write_zarr(os.path.join(sat, "data"), frames, chunks=(16, n_ch, grid, grid))
    write_zarr(os.path.join(sat, "time"), times, chunks=(n_frames,))
    write_zarr(os.path.join(sat, "x"), np.arange(grid) * 2000.0 + 100_000.0,
               chunks=(grid,))
    write_zarr(os.path.join(sat, "y"), np.arange(grid) * 2000.0 + 500_000.0,
               chunks=(grid,))

    n_init, n_var, n_step, ngrid = 16, 10, 9, 80
    nwp = os.path.join(root, "nwp.zarr")
    nwp_data = rng.standard_normal(
        (n_init, n_var, n_step, ngrid, ngrid)
    ).astype(np.float32)
    write_zarr(os.path.join(nwp, "data"), nwp_data,
               chunks=(1, n_var, 3, ngrid, ngrid))
    write_zarr(os.path.join(nwp, "init_time"),
               np.arange(n_init, dtype=np.float64) * 3.0, chunks=(n_init,),
               attrs={"units": "hours since 2020-06-01T00:00"})
    write_zarr(os.path.join(nwp, "step"), np.arange(n_step, dtype=np.int32),
               chunks=(n_step,), attrs={"units": "hours"})
    write_zarr(os.path.join(nwp, "x"), np.arange(ngrid) * 2000.0 + 90_000.0,
               chunks=(ngrid,))
    write_zarr(os.path.join(nwp, "y"), np.arange(ngrid) * 2000.0 + 490_000.0,
               chunks=(ngrid,))

    gsp_times = (
        t0 - np.timedelta64(2, "h") + np.arange(110) * np.timedelta64(30, "m")
    )
    rows = [
        dict(datetime_gmt=str(t), gsp_id=gsp,
             generation_mw=float(rng.uniform(0, cap * 0.8)), capacity_mwp=cap)
        for t in gsp_times
        for gsp, cap in ((101, 120.0), (102, 340.0))
    ]
    gsp_csv = os.path.join(root, "pvlive.csv")
    pd.DataFrame(rows).to_csv(gsp_csv, index=False)

    n_sys = 32
    sys_ids = np.arange(7000, 7000 + n_sys)
    pv_times = t0 - np.timedelta64(1, "h") + np.arange(600) * np.timedelta64(5, "m")
    pv_csv = os.path.join(root, "passiv.csv")
    pd.DataFrame({
        "timestamp": np.repeat(pv_times.astype(str), n_sys),
        "ss_id": np.tile(sys_ids, pv_times.size),
        "instantaneous_power_w": rng.uniform(
            0, 3000, size=pv_times.size * n_sys
        ),
    }).to_csv(pv_csv, index=False)
    meta_csv = os.path.join(root, "passiv_meta.csv")
    # system locations must leave room for every modality's crop: the 64px
    # NWP crop needs ±64 km from its grid edges (x 90..248 km, y 490..648 km)
    pd.DataFrame({
        "ss_id": sys_ids,
        "kwp": rng.uniform(2.0, 5.0, n_sys),
        "x": rng.uniform(155_000.0, 183_000.0, n_sys),
        "y": rng.uniform(555_000.0, 583_000.0, n_sys),
    }).to_csv(meta_csv, index=False)

    datamodule = ZarrStreamDataModule(
        zarr_path=sat,
        nwp_zarr_path=nwp,
        nwp_image_size_pixels=64,
        pv_csv=pv_csv,
        pv_metadata_csv=meta_csv,
        gsp_csv=gsp_csv,
        batch_size=args.batch_size,
        history_minutes=30,
        forecast_minutes=120,
        satellite_image_size_pixels=24,
        n_train_data=args.steps + 8,
        test_fraction=0.1,
        num_workers=args.workers,
    )
    loader = datamodule.train_dataloader()
    return loader.dataset, loader


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--shards", type=int, default=64)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--dir", default=None, help="shard dir (default: tmpfs)")
    parser.add_argument(
        "--device-ceiling", type=float, default=None,
        help="device train-step rate (batches/s) to compare the host rate "
        "against — measure it with bench.py on YOUR device; without it the "
        "fraction falls back to this repo's recorded v5e reference numbers "
        "and is labelled as such",
    )
    parser.add_argument(
        "--host-only", action="store_true",
        help="measure the host pipeline alone (shard read -> decode -> "
        "transfer-ready), no device: isolates the framework from the "
        "host-device link (the SURVEY north-star gate is host rate >= "
        "device step rate)",
    )
    parser.add_argument(
        "--wire", choices=("int16", "f32"), default="int16",
        help="int16 = raw counts shipped, fused decode on device (native); "
        "f32 = decode+normalise on host as the reference's DataLoader "
        "workers did (netcdf_dataset.py:96-101) - 2x the bytes",
    )
    parser.add_argument(
        "--format", choices=("raw", "netcdf", "zarr-stream"), default="raw",
        help="raw = native mmap shard format; netcdf = the reference's v15 "
        "per-source NetCDF batch files (h5netcdf conventions) read by "
        "NetCDFBatchDataset — the host >= device gate on the reference's "
        "actual published on-disk format; zarr-stream = NO prepare step: "
        "live window sampling from synthetic production-shaped zarr/CSV "
        "archives (satellite+NWP+PV+GSP+sun) through data/sources.py, the "
        "ZarrStreamDataModule path (VERDICT r3 #4)",
    )
    args = parser.parse_args()

    from bench import flagship_configuration, flagship_model
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.loader import PrefetchingLoader
    from predict_pv_yield_tpu.data.netcdf_reader import NetCDFBatchDataset
    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch
    from predict_pv_yield_tpu.data.shards import ShardDataset, write_shard
    from predict_pv_yield_tpu.training.engine import Trainer

    configuration = flagship_configuration(args.batch_size)
    cleanup_dir = None
    if args.dir:
        directory = args.dir
    else:
        directory = tempfile.mkdtemp(
            prefix="shards_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
        )
        # RAM-backed tmpfs: a leaked ~3 GB dir per run fills /dev/shm
        cleanup_dir = directory
        import atexit
        import shutil as _shutil

        atexit.register(_shutil.rmtree, cleanup_dir, True)

    if args.format == "zarr-stream":
        print(f"writing streaming archives to {directory} ...", file=sys.stderr)
        dataset, loader = _build_zarr_stream(directory, args)
    else:
        print(f"writing {args.shards} {args.format} batches to {directory} ...", file=sys.stderr)
        for i in range(args.shards):
            rng = np.random.default_rng(i)
            batch = fake_batch(configuration, rng)
            # native wire format: raw int16 satellite counts
            raw = rng.integers(-1, 1023, size=batch.satellite.data.shape, dtype=np.int16)
            batch = batch.replace(satellite=batch.satellite.replace(data=raw))
            if args.format == "netcdf":
                write_v15_batch(directory, i, batch)
            else:
                write_shard(directory, i, batch, fmt="raw")

        if args.format == "netcdf":
            dataset = NetCDFBatchDataset(args.shards, directory)
        else:
            dataset = ShardDataset(n_batches=args.shards, src_path=directory)
        loader = PrefetchingLoader(
            dataset, num_workers=args.workers, prefetch_factor=8, shuffle=True
        )

    from predict_pv_yield_tpu.consts import SAT_MEAN, SAT_STD

    def host_decode_f32(batch):
        """The reference's host-side decode path, for the wire comparison.
        Handles both the canonical (B,C,T,H,W) and the netcdf channel-last
        (B,T,H,W,C) wire layouts."""
        sat = batch.satellite.data.astype(np.float32)
        if batch.satellite.channel_last:
            n = sat.shape[-1]
            sat = (sat - SAT_MEAN[:n]) / SAT_STD[:n]  # broadcast over last axis
            sat = np.ascontiguousarray(sat.transpose(0, 4, 1, 2, 3))
            return batch.replace(
                satellite=batch.satellite.replace(data=sat, channel_last=False)
            )
        n = sat.shape[1]
        sat = (sat - SAT_MEAN[:n, None, None, None]) / SAT_STD[:n, None, None, None]
        return batch.replace(satellite=batch.satellite.replace(data=sat))

    def batch_bytes(batch):
        """Total wire bytes + one touched byte per 4 KiB page: mmap-backed
        raw shards defer the actual byte flow to the consumer, so fault every
        page in (what device_put will do) to keep the host number honest."""
        import jax

        total = 0
        for leaf in jax.tree_util.tree_leaves(batch.numeric()):
            total += leaf.nbytes
            if leaf.nbytes:
                if leaf.flags["C_CONTIGUOUS"]:
                    flat = leaf.reshape(-1).view(np.uint8)
                else:  # the copy faults pages; flatten so the stride is bytes
                    flat = np.ascontiguousarray(leaf).reshape(-1).view(np.uint8)
                int(flat[:: 4096].sum())
        return total

    if args.host_only:
        # Host pipeline alone: threaded shard decode + (optional) host f32
        # decode + wire cast — everything up to the device_put boundary.
        count, nbytes = 0, 0
        # the SAME wire config as the e2e path: the host rate must include
        # the f32->f16 wire cast the real _to_device performs per batch
        trainer = Trainer(max_epochs=1, profiler=None, precision=16,
                          wire_float16=True)
        # warm the page cache / thread pool
        for batch in loader:
            break
        t0 = time.perf_counter()
        while count < args.steps:
            for batch in loader:
                if args.wire == "f32":
                    batch = host_decode_f32(batch)
                prepared = trainer._wire_cast(trainer._maybe_cast(batch.numeric()))
                nbytes += batch_bytes(prepared)
                count += 1
                if count >= args.steps:
                    break
        dt = time.perf_counter() - t0
        value = count / dt
        payload = {
            "metric": (
                f"host pipeline batches/sec ({args.format} format, "
                f"{args.wire} wire, b{args.batch_size}, "
                f"{args.workers} threads)"
            ),
            "value": round(value, 3),
            "unit": "batches/s",
            "wire_mb_per_batch": round(nbytes / count / 1e6, 2),
            "host_mb_per_s": round(nbytes / dt / 1e6, 1),
        }
        # The host >= device gate in one number. A live ceiling comes from
        # --device-ceiling (bench.py's b32 rate on the actual device); the
        # fallback constants are THIS repo's recorded v5e reference rates
        # (PARITY.md perf table) and are labelled so a stale/foreign-device
        # fraction can't masquerade as a live measurement.
        reference_ceilings = {32: 35.4, 128: 27.3}  # bench.py, TPU v5e, round 4
        if args.device_ceiling:
            payload["fraction_of_compute_ceiling"] = round(
                value / args.device_ceiling, 3
            )
            payload["device_ceiling_source"] = "--device-ceiling (measured)"
        elif args.batch_size in reference_ceilings:
            payload["fraction_of_compute_ceiling"] = round(
                value / reference_ceilings[args.batch_size], 3
            )
            payload["device_ceiling_source"] = (
                "recorded v5e reference (bench.py round 4); pass "
                "--device-ceiling for your device"
            )
        if args.format == "zarr-stream":
            # prepare-first conversion rate: the SAME extraction pipeline,
            # but paid once — sample + write native raw shards, which then
            # read back at the raw-format host rate (294.7 b/s, module
            # docstring). This is the measured basis for MIGRATION.md's
            # "no prepare step" caveat.
            out_dir = os.path.join(directory, "prepared")
            os.makedirs(out_dir, exist_ok=True)
            n_conv = min(args.steps, 10)
            t0 = time.perf_counter()
            for i in range(n_conv):
                write_shard(out_dir, i, dataset[i], fmt="raw")
            payload["prepare_batches_per_s"] = round(
                n_conv / (time.perf_counter() - t0), 3
            )
        print(json.dumps(payload))
        return

    model = flagship_model(args.batch_size)
    trainer = Trainer(max_epochs=1, profiler=None, precision=16, wire_float16=True)
    trainer.setup(model, dataset[0])
    step = trainer._compiled["train"]
    state = trainer.state

    import jax

    # warm: compile + first pass
    warm = 0
    for _, device_batch in trainer._iter_batches(loader, limit=4):
        state, metrics = step(state, device_batch)
        warm += 1
    jax.device_get(metrics)

    count = 0
    t0 = time.perf_counter()
    while count < args.steps:
        for _, device_batch in trainer._iter_batches(loader, limit=None):
            state, metrics = step(state, device_batch)
            count += 1
            if count >= args.steps:
                break
    jax.device_get(metrics)
    dt = time.perf_counter() - t0

    value = count / dt
    # reference baseline: 4.2 batches-of-32/s (BASELINE.md) = 134.4 ex/s;
    # device compute ceilings measured by bench.py at the two operating
    # points (PARITY.md perf table) — only quote one when it applies
    baseline_ex_s = 4.2 * 32
    ceilings = {32: 35.4, 128: 27.3}
    payload = {
        "metric": (
            f"conv3d_sat_nwp end-to-end batches/sec/chip (host shards, "
            f"b{args.batch_size}, bf16)"
        ),
        "value": round(value, 3),
        "unit": "batches/s/chip",
        "vs_baseline": round(value * args.batch_size / baseline_ex_s, 3),
    }
    if args.batch_size in ceilings:
        payload["fraction_of_compute_ceiling"] = round(
            value / ceilings[args.batch_size], 3
        )
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
