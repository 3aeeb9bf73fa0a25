"""Prepare an on-disk batch-shard dataset.

The reference trains from directories of pre-prepared per-batch files plus a
``configuration.yaml`` (produced by the external ``nowcasting_dataset``
pipeline; consumed at reference ``dataloader.py:78-102``). This tool writes a
dataset in the native shard format (``data/shards.py``):

    <out>/configuration.yaml
    <out>/train/000000.shard ...   (flat raw format, mmap-read hot path)
    <out>/test/000000.shard ...

``--format npz`` writes numpy archives instead (smaller over a network;
the raw format is 4-5x faster to read from local disk).

Sources: ``--fake`` synthesises batches (for demos/CI and for driving the
full non-fake loader path), or ``--satellite-zarr`` samples windows from a
zarr archive via the first-party reader; ``--nwp-zarr`` adds real NWP grids
(freshest-run selection, centre-cropped) and ``--gsp-csv`` real GSP targets.
Usage:

    python tools/prepare_dataset.py --out data/v0 --fake --n-train 64 --n-test 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--fake", action="store_true")
    parser.add_argument("--n-train", type=int, default=64)
    parser.add_argument("--n-test", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--history-minutes", type=int, default=30)
    parser.add_argument("--forecast-minutes", type=int, default=60)
    parser.add_argument("--satellite-pixels", type=int, default=24)
    parser.add_argument("--nwp-pixels", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--format", choices=("raw", "npz", "netcdf"), default="raw",
        help="raw/npz = native shard formats; netcdf = the reference's v15 "
        "per-source NetCDF batch tree (h5netcdf byte conventions, "
        "data/netcdf_writer.py) readable by the reference's own tooling",
    )
    parser.add_argument(
        "--satellite-zarr", default=None,
        help="zarr group store to sample real satellite windows from "
        "(arrays: --zarr-array imagery sliceable on time, --zarr-time "
        "datetimes, optional x/y OSGB pixel coords). The satellite group, "
        "datetime features and t0 metadata come from the archive via the "
        "nb28 DataSource pipeline (data/sources.py); --nwp-zarr/--hrv-zarr/"
        "--topo-zarr/--pv-csv/--gsp-csv make the remaining groups real too; "
        "anything left uncovered stays synthetic.",
    )
    parser.add_argument("--zarr-array", default="data")
    parser.add_argument("--zarr-time", default="time")
    parser.add_argument(
        "--nwp-zarr", default=None,
        help="zarr group store of NWP model runs (real-UKV layout by "
        "default: --nwp-dims init_time,variable,step,y,x with init_time/"
        "step coordinate arrays and optional OSGB x/y). Real NWP grids are "
        "extracted with freshest-run-per-hourly-target selection, cropped "
        "--nwp-pixels around each example's centre, on the model contract's "
        "hourly grid (requires --satellite-zarr for the window grid).",
    )
    parser.add_argument("--nwp-zarr-array", default="data")
    parser.add_argument("--nwp-init-time", default="init_time")
    parser.add_argument("--nwp-step", default="step")
    parser.add_argument(
        "--nwp-dims", default="init_time,variable,step,y,x",
        help="comma-separated axis order of the NWP store",
    )
    parser.add_argument(
        "--hrv-zarr", default=None,
        help="zarr group of the high-resolution visible channel (single "
        "channel, own grid) -> the hrvsatellite batch group, cropped "
        "--hrv-pixels around each example's centre",
    )
    parser.add_argument("--hrv-zarr-array", default="data")
    parser.add_argument("--hrv-zarr-time", default="time")
    parser.add_argument("--hrv-pixels", type=int, default=64)
    parser.add_argument(
        "--topo-zarr", default=None,
        help="zarr group holding one (H, W) elevation grid + OSGB x/y -> "
        "the topographic batch group, cropped --topo-pixels per example",
    )
    parser.add_argument("--topo-pixels", type=int, default=64)
    parser.add_argument(
        "--pv-csv", default=None,
        help="PVOutput/Passiv-style long-format power dump -> real PV yield "
        "series (one clean system per example). With --pv-metadata-csv, the "
        "system locations also TURN ON location-driven extraction: each "
        "example draws a PV system's OSGB location and every modality "
        "(satellite/HRV/NWP/topo crops, sun angles, nearest-PV pick) is "
        "extracted around it",
    )
    parser.add_argument("--pv-metadata-csv", default=None,
                        help="per-system metadata (id, kwp, location)")
    parser.add_argument(
        "--gsp-csv", default=None,
        help="long-format PVLive dump (datetime_gmt, gsp_id, generation_mw, "
        "capacity_mwp) providing real 30-minute GSP targets for the "
        "sampled windows (requires --satellite-zarr for the window grid)",
    )
    parser.add_argument("--n-gsp", type=int, default=1,
                        help="GSPs per example when --gsp-csv is given")
    parser.add_argument(
        "--test-fraction", type=float, default=0.2,
        help="held-out tail of the archive's time axis used for the test "
        "split (prevents train/test window overlap; zarr mode only)",
    )
    parser.add_argument(
        "--workers", type=int, default=min(8, os.cpu_count() or 1),
        help="concurrent batch builders (threads). Batches are independent "
        "— each gets its own (seed, split, index)-derived rng for sampling "
        "AND filler, so output is bit-identical at any worker count; zarr "
        "decode and numpy release the GIL, so conversion scales with cores "
        "(the reference's nowcasting_dataset prepared batches with a "
        "process pool the same way)",
    )
    args = parser.parse_args()

    from predict_pv_yield_tpu.config.dataset import Configuration
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.shards import write_shard

    if not args.fake and not args.satellite_zarr:
        parser.error("pass --fake or --satellite-zarr")

    sat_source = None
    if args.satellite_zarr:
        from predict_pv_yield_tpu.data.sources import (
            SampleGenerator,
            open_zarr_satellite,
        )

        try:
            sat_source = open_zarr_satellite(
                args.satellite_zarr, args.zarr_array, args.zarr_time,
                image_size_pixels=args.satellite_pixels,
            )
        except ValueError as exc:
            parser.error(str(exc))
        sun_source = None
        if sat_source.x is not None and sat_source.y is not None:
            from predict_pv_yield_tpu.data.sources import SunSource

            # real solar angles at the archive centre (first-party NOAA)
            sun_source = SunSource(
                float(np.median(sat_source.x)), float(np.median(sat_source.y))
            )
        gsp_source = None
        if args.gsp_csv:
            from predict_pv_yield_tpu.data.sources import GSPSource

            gsp_source = GSPSource.from_pvlive_csv(
                args.gsp_csv, n_gsp_per_example=args.n_gsp
            )
        nwp_source = None
        if args.nwp_zarr:
            from predict_pv_yield_tpu.data.sources import open_zarr_nwp
            from predict_pv_yield_tpu.seqlen import SeqLens

            try:
                nwp_source = open_zarr_nwp(
                    args.nwp_zarr,
                    array=args.nwp_zarr_array,
                    init_time=args.nwp_init_time,
                    step=args.nwp_step,
                    dims=tuple(args.nwp_dims.split(",")),
                    image_size_pixels=args.nwp_pixels,
                    # BatchML/fake-backend contract: hourly targets with the
                    # reference's ceil-history rule (seqlen.py)
                    n_targets=SeqLens(
                        args.history_minutes, args.forecast_minutes
                    ).seq_len_60,
                )
            except (ValueError, FileNotFoundError) as exc:
                parser.error(str(exc))
        hrv_source = None
        if args.hrv_zarr:
            hrv_source = open_zarr_satellite(
                args.hrv_zarr, args.hrv_zarr_array, args.hrv_zarr_time,
                image_size_pixels=args.hrv_pixels, key_prefix="hrv",
            )
        topo_source = None
        if args.topo_zarr:
            from predict_pv_yield_tpu.data.sources import open_zarr_topographic

            topo_source = open_zarr_topographic(
                args.topo_zarr, image_size_pixels=args.topo_pixels
            )
        pv_source = None
        locations = None
        if args.pv_csv:
            if not args.pv_metadata_csv:
                parser.error("--pv-csv requires --pv-metadata-csv")
            from predict_pv_yield_tpu.data.sources import PVDataSource

            pv_source = PVDataSource.from_passiv_csv(
                args.pv_csv, args.pv_metadata_csv
            )
            if pv_source.x is not None and pv_source.y is not None:
                # nowcasting_dataset's pick-a-system-then-extract loop
                locations = np.stack([pv_source.x, pv_source.y], axis=1)
    elif args.gsp_csv or args.nwp_zarr or args.hrv_zarr or args.topo_zarr or args.pv_csv:
        parser.error(
            "--gsp-csv/--nwp-zarr/--hrv-zarr/--topo-zarr/--pv-csv require "
            "--satellite-zarr"
        )

    configuration = Configuration()
    configuration.process.batch_size = args.batch_size
    configuration.input_data.default_history_minutes = args.history_minutes
    configuration.input_data.default_forecast_minutes = args.forecast_minutes
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = args.satellite_pixels
    configuration.input_data.nwp.nwp_image_size_pixels = args.nwp_pixels
    if sat_source is not None:
        # channel count follows the archive ((T,H,W) = 1, (T,C,H,W) = C)
        n_ch = 1 if len(sat_source.data.shape) == 3 else sat_source.data.shape[1]
        channels = list(configuration.input_data.satellite.satellite_channels)
        if n_ch > len(channels):
            parser.error(
                f"archive has {n_ch} channels > the {len(channels)} named "
                "satellite channels"
            )
        configuration.input_data.satellite.satellite_channels = channels[:n_ch]
    if args.gsp_csv:
        configuration.input_data.gsp.n_gsp_per_example = args.n_gsp
    if args.nwp_zarr:
        # channel count follows the archive (canonical axis 2 = channel)
        n_nwp_ch = nwp_source.data.shape[2]
        nwp_channels = list(configuration.input_data.nwp.nwp_channels)
        if n_nwp_ch > len(nwp_channels):
            parser.error(
                f"NWP archive has {n_nwp_ch} channels > the "
                f"{len(nwp_channels)} named NWP channels"
            )
        configuration.input_data.nwp.nwp_channels = nwp_channels[:n_nwp_ch]
    if args.hrv_zarr:
        configuration.input_data.hrvsatellite.hrvsatellite_image_size_pixels = (
            args.hrv_pixels
        )
    if args.topo_zarr:
        configuration.input_data.topographic.topographic_image_size_pixels = (
            args.topo_pixels
        )
    if args.pv_csv:
        configuration.input_data.pv.n_pv_systems_per_example = 1

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "configuration.yaml"), "w") as fh:
        yaml.safe_dump(
            {
                "general": {"name": "prepared", "description": "native shard dataset"},
                "process": {"batch_size": args.batch_size},
                "input_data": {
                    "default_history_minutes": args.history_minutes,
                    "default_forecast_minutes": args.forecast_minutes,
                    "satellite": {
                        "satellite_image_size_pixels": args.satellite_pixels,
                        "satellite_channels": list(
                            configuration.input_data.satellite.satellite_channels
                        ),
                    },
                    "nwp": {
                        "nwp_image_size_pixels": args.nwp_pixels,
                        "nwp_channels": list(configuration.input_data.nwp.nwp_channels),
                    },
                    # written-out gsp geometry must match the shards: a
                    # consumer deriving shapes from this yaml (fake filler,
                    # batch_shapes validation) otherwise reconstructs the
                    # default n_gsp_per_example=1 against (B, T, n) shards
                    "gsp": {
                        "n_gsp_per_example": int(
                            configuration.input_data.gsp.n_gsp_per_example
                        ),
                    },
                    "hrvsatellite": {
                        "hrvsatellite_image_size_pixels": int(
                            configuration.input_data.hrvsatellite.hrvsatellite_image_size_pixels
                        ),
                    },
                    "topographic": {
                        "topographic_image_size_pixels": int(
                            configuration.input_data.topographic.topographic_image_size_pixels
                        ),
                    },
                    "pv": {
                        "n_pv_systems_per_example": int(
                            configuration.input_data.pv.n_pv_systems_per_example
                        ),
                    },
                },
            },
            fh,
        )

    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch

    for split, count in (("train", args.n_train), ("test", args.n_test)):
        directory = os.path.join(args.out, split)
        generator = None
        if sat_source is not None:
            from predict_pv_yield_tpu.data.sources import collate_samples

            split_sources = [sat_source]
            if nwp_source is not None:
                split_sources.append(nwp_source)
            if hrv_source is not None:
                split_sources.append(hrv_source)
            if topo_source is not None:
                split_sources.append(topo_source)
            if pv_source is not None:
                split_sources.append(pv_source)
            if sun_source is not None:
                split_sources.append(sun_source)
            if gsp_source is not None:
                split_sources.append(gsp_source)
            # windows come from disjoint time partitions: the archive tail
            # is held out for test (no train/test window overlap)
            cut = int(len(sat_source.datetimes) * (1.0 - args.test_fraction))
            split_times = (
                sat_source.datetimes[:cut]
                if split == "train"
                else sat_source.datetimes[cut:]
            )
            generator = SampleGenerator(
                split_sources,
                datetimes=split_times,
                history_minutes=args.history_minutes,
                forecast_minutes=args.forecast_minutes,
                rng=np.random.default_rng((args.seed, split == "test", 1 << 20)),
                locations=locations,
            )
        def build_one(i: int, _generator=generator, _directory=directory,
                      _split=split) -> None:
            rng = np.random.default_rng((args.seed, _split == "test", i))
            batch = fake_batch(configuration, rng)
            if _generator is not None:
                from predict_pv_yield_tpu.data.sources import merge_real_groups

                # per-index sampling rng (not the generator's shared stream):
                # batch i is the same batch at ANY --workers count
                real = collate_samples(_generator.sample(
                    args.batch_size,
                    rng=np.random.default_rng(
                        (args.seed, _split == "test", i, 7)
                    ),
                ))
                batch = merge_real_groups(batch, real)
            if args.format == "netcdf":
                # int16 satellite wire, as the real v15 archives ship it
                if _generator is None:
                    raw = rng.integers(
                        -1, 1023, size=batch.satellite.data.shape, dtype=np.int16
                    )
                else:
                    # the wire is raw int16 counts: refuse archives that are
                    # not integral counts in range instead of wrapping
                    vals = np.asarray(batch.satellite.data)
                    if (
                        vals.min() < np.iinfo(np.int16).min
                        or vals.max() > np.iinfo(np.int16).max
                        or not np.array_equal(vals, np.round(vals))
                    ):
                        raise ValueError(
                            "--format netcdf writes the int16 satellite "
                            "wire, but the archive holds non-integral or "
                            "out-of-range values (already-decoded floats?) "
                            "— use --format raw or npz"
                        )
                    raw = np.round(vals).astype(np.int16)
                batch = batch.replace(
                    satellite=batch.satellite.replace(data=raw)
                )
                write_v15_batch(_directory, i, batch)
            else:
                write_shard(_directory, i, batch, fmt=args.format)

        if args.workers > 1 and count > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=args.workers) as pool:
                # list() drains the map so the first failure raises here
                list(pool.map(build_one, range(count)))
        else:
            for i in range(count):
                build_one(i)
        print(f"wrote {count} batches to {directory}")


if __name__ == "__main__":
    main()
