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

import json
import os
import struct
from typing import Dict, Optional

import numpy as np

from predict_pv_yield_tpu.data.batch import Batch

_RAW_MAGIC = b"PVSHARD1"


def shard_filename(index: int, fmt: str = "npz") -> str:
    return f"{index:06d}.{'shard' if fmt == 'raw' else 'npz'}"


def _batch_arrays(batch: Batch) -> Dict[str, np.ndarray]:
    arrays: Dict[str, np.ndarray] = {}
    # iterate the Batch schema itself: a hard-coded name list would
    # silently drop any future group from every written shard
    for group in batch.__dataclass_fields__:
        sub = getattr(batch, group)
        for field in sub.__dataclass_fields__:
            value = getattr(sub, field)
            if value is not None:
                arrays[f"{group}/{field}"] = np.asarray(value)
    return arrays


def write_shard(
    directory: str, index: int, batch: Batch, compress: bool = True,
    fmt: str = "npz",
) -> str:
    """Write one batch shard; returns the path.

    ``fmt="npz"``: numpy archive, ``compress=False`` for plain (local SSD)
    or True for zlib (cloud storage). ``fmt="raw"``: the flat first-party
    layout — magic, a JSON index, then 64-byte-aligned raw array payloads.
    Raw is the local-disk hot path: reading is ONE buffered read plus
    zero-copy ``frombuffer`` views, no per-member zipfile CRC32 (measured
    4-5× faster than plain npz at flagship batch sizes, the difference
    between starving and saturating the chip at b32)."""
    os.makedirs(directory, exist_ok=True)
    arrays = _batch_arrays(batch)
    path = os.path.join(directory, shard_filename(index, fmt))
    tmp = path + ".tmp"
    if fmt == "raw":
        index_entries = {}
        offset = 0
        for key, value in arrays.items():
            value = np.ascontiguousarray(value)
            arrays[key] = value
            offset = (offset + 63) & ~63
            index_entries[key] = {
                "dtype": value.dtype.str,
                "shape": list(value.shape),
                "offset": offset,
            }
            offset += value.nbytes
        header = json.dumps(index_entries).encode()
        # Pad the header (JSON ignores trailing spaces) so payload_start
        # itself sits on a 64-byte boundary — offsets are relative to it, so
        # without this the per-array alignment above would be vacuous and the
        # mmap'd frombuffer views unaligned for int16/f32 consumers.
        preamble = len(_RAW_MAGIC) + 4
        header += b" " * (-(preamble + len(header)) % 64)
        with open(tmp, "wb") as fh:
            fh.write(_RAW_MAGIC + struct.pack("<I", len(header)) + header)
            payload_start = fh.tell()
            for key, value in arrays.items():
                pos = payload_start + index_entries[key]["offset"]
                fh.seek(pos)
                fh.write(value.tobytes())
    else:
        with open(tmp, "wb") as fh:
            (np.savez_compressed if compress else np.savez)(fh, **arrays)
    os.replace(tmp, path)
    return path


def read_shard(path: str) -> Batch:
    """Read one shard (either format, detected by magic) into a Batch.

    Raw shards are memory-mapped: the returned arrays are zero-copy views
    into the page cache, so "reading" a 50 MB shard is ~1 ms of header
    parsing and the bytes flow exactly once, page-cache → device, when the
    engine's ``device_put`` consumes them."""
    nested: Dict[str, Dict[str, np.ndarray]] = {}
    with open(path, "rb") as fh:
        magic = fh.read(8)
        if magic == _RAW_MAGIC:
            import mmap

            (header_len,) = struct.unpack("<I", fh.read(4))
            index_entries = json.loads(fh.read(header_len))
            payload_start = fh.tell()
            mapped = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
            buffer = memoryview(mapped)
            for key, entry in index_entries.items():
                group, field = key.split("/", 1)
                dtype = np.dtype(entry["dtype"])
                count = int(np.prod(entry["shape"], dtype=np.int64))
                value = np.frombuffer(
                    buffer, dtype, count=count,
                    offset=payload_start + entry["offset"],
                ).reshape(entry["shape"])
                nested.setdefault(group, {})[field] = value
            return Batch.from_dict(nested)
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
        self._fmt: Optional[str] = None  # detected on first access
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

    def _filename(self, index: int) -> str:
        if self._fmt is None:
            exists = (
                self._fs.exists if self._fs is not None
                else lambda p: os.path.exists(p)
            )
            base = self.src_path
            if exists(os.path.join(base, shard_filename(index, "raw"))):
                self._fmt = "raw"
            elif exists(os.path.join(base, shard_filename(index, "npz"))):
                self._fmt = "npz"
            else:
                # neither candidate exists for the probe index: don't latch
                # a guess that would misreport every later miss as the
                # wrong format
                raise FileNotFoundError(
                    f"no {shard_filename(index, 'raw')} or "
                    f"{shard_filename(index, 'npz')} under {base}"
                )
        return shard_filename(index, self._fmt)

    def __getitem__(self, index: int) -> Batch:
        if not 0 <= index < self.n_batches:
            raise IndexError(
                f"batch index must be in [0, {self.n_batches}), not {index}"
            )
        name = self._filename(index)
        if self._fs is not None:
            # Remote fetch with the reference's retry posture (its gcsfs
            # patch retried transient HTTP errors, SURVEY §5.3).
            import time

            local = os.path.join(self.tmp_path or ".", name)
            # fsspec's get_file opens the local target without creating
            # parents — a missing temp dir would otherwise masquerade as 5
            # retried "transient" fetch failures
            os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
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
