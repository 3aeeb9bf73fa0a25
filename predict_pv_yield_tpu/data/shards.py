"""On-disk batch shards.

The reference's prepared datasets are one NetCDF file per batch, fetched from
GCS and decoded per DataLoader worker (reference ``netcdf_dataset.py:59-105``,
external ``nowcasting_dataloader.datasets.NetCDFDataset``). NetCDF/HDF5 and
zarr client libraries are not part of this image, so the native format here is
the simplest thing that preserves the contract: one ``.npz`` file per batch
(``000000.npz``, ``000001.npz``, …) whose keys are the flattened Batch field
paths (``satellite/data``, ``pv/pv_yield``, …).

Satellite imagery may be stored raw as int16 counts — exactly like the
reference's zarr archives — and is then decoded/normalised *on device* by the
fused XLA preprocessing stage (``data/preprocess.py``), not on the host: the
int16→float32 conversion triples the bytes, so shipping int16 over PCIe/DMA
and widening in HBM is the bandwidth-optimal order.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from predict_pv_yield_tpu.data.batch import Batch


def shard_filename(index: int) -> str:
    return f"{index:06d}.npz"


def write_shard(directory: str, index: int, batch: Batch, compress: bool = True) -> str:
    """Write one batch as an ``.npz`` shard; returns the path.

    ``compress=False`` writes a plain npz — the right choice for local
    SSD/tmpfs stores, where zlib decompression (GIL-heavy) costs more than
    the bytes saved; keep compression for cloud storage."""
    os.makedirs(directory, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    for group in ("satellite", "hrvsatellite", "nwp", "pv", "gsp", "sun", "topographic", "datetime", "metadata"):
        sub = getattr(batch, group)
        for field in sub.__dataclass_fields__:
            value = getattr(sub, field)
            if value is not None:
                arrays[f"{group}/{field}"] = np.asarray(value)
    path = os.path.join(directory, shard_filename(index))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        (np.savez_compressed if compress else np.savez)(fh, **arrays)
    os.replace(tmp, path)
    return path


def read_shard(path: str) -> Batch:
    """Read one ``.npz`` shard back into a Batch."""
    nested: Dict[str, Dict[str, np.ndarray]] = {}
    with np.load(path) as data:
        for key in data.files:
            group, field = key.split("/", 1)
            nested.setdefault(group, {})[field] = data[key]
    return Batch.from_dict(nested)


class ShardDataset:
    """Map-style dataset over a directory of batch shards.

    API slice of the external ``NetCDFDataset``: ``len()`` = number of
    batches, ``[i]`` returns the whole i-th batch (reference
    ``netcdf_dataset.py:59-77``). Remote paths (``gs://…``) are fetched via
    fsspec/gcsfs when available; this image has neither, so remote access
    raises a clear error instead of silently degrading.
    """

    def __init__(self, n_batches: int, src_path: str, configuration=None,
                 tmp_path: Optional[str] = None):
        self.n_batches = n_batches
        self.src_path = src_path
        self.tmp_path = tmp_path
        self.configuration = configuration
        self._fs = None
        if "://" in src_path:
            try:
                import fsspec

                self._fs = fsspec.filesystem(src_path.split("://", 1)[0])
            except ImportError as exc:
                raise RuntimeError(
                    f"remote shard path {src_path!r} needs fsspec, which is not installed"
                ) from exc

    def __len__(self) -> int:
        return self.n_batches

    def __getitem__(self, index: int) -> Batch:
        if not 0 <= index < self.n_batches:
            raise IndexError(
                f"batch index must be in [0, {self.n_batches}), not {index}"
            )
        name = shard_filename(index)
        if self._fs is not None:
            # Remote fetch with the reference's retry posture (its gcsfs
            # patch retried transient HTTP errors, SURVEY §5.3).
            import time

            local = os.path.join(self.tmp_path or ".", name)
            last_error: Exception | None = None
            for attempt in range(5):
                try:
                    self._fs.get(os.path.join(self.src_path, name), local)
                    break
                except Exception as exc:  # transient cloud-FS errors
                    last_error = exc
                    time.sleep(min(2**attempt, 8))
            else:
                raise RuntimeError(
                    f"failed to fetch shard {name} after 5 attempts"
                ) from last_error
            batch = read_shard(local)
            os.remove(local)
            return batch
        return read_shard(os.path.join(self.src_path, name))
