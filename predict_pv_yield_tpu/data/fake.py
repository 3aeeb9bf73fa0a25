"""Fake-data backend — random batches shaped by a dataset Configuration.

Native equivalent of the external ``nowcasting_dataloader.fake.FakeDataset``,
the cornerstone of the reference's test strategy (reference
``tests/models/conv3d/test_conv3d_model.py:5,29``; settable ``.length`` at
``test_conv3d_model.py:54``; datamodule ``fake_data`` flag at
``dataloader.py:62,94-95``).

Each ``__getitem__`` returns one full :class:`Batch` of host numpy arrays —
the dataset yields whole batches, matching the reference's
``DataLoader(batch_size=None)`` contract (``dataloader.py:90``). Batches are
deterministic per (seed, index) so tests are reproducible.

For on-device benchmarking there is also :func:`fake_batch_on_device`, which
synthesises a batch directly in HBM so data-pipeline time is excluded from
pure-compute benchmarks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from predict_pv_yield_tpu.data.batch import (
    Batch,
    batch_shapes,
    field_dtype,
)

#: 2021-06-01 00:00 UTC in ns — an arbitrary but fixed fake-time origin.
_T0_NS = 1_622_505_600_000_000_000
_NS_PER_MIN = 60_000_000_000


def _cadence_minutes(name: str) -> int:
    """Timestep of a datetime axis by field name (Batch schema cadences)."""
    if "gsp" in name:
        return 30
    if name in ("target_time", "init_time"):
        return 60  # NWP hourly target grid
    return 5  # satellite / hrvsatellite 5-minute imagery


def fake_batch(configuration, rng: np.random.Generator) -> Batch:
    """One random Batch with the static shapes implied by ``configuration``."""
    shapes = batch_shapes(configuration)
    data: dict = {}
    for group, fields in shapes.items():
        data[group] = {}
        for name, shape in fields.items():
            dtype = field_dtype(name)
            if dtype == np.float32:
                if name == "sun_elevation_angle":
                    arr = rng.uniform(-10.0, 60.0, size=shape).astype(np.float32)
                elif name == "sun_azimuth_angle":
                    arr = rng.uniform(0.0, 360.0, size=shape).astype(np.float32)
                elif name == "topo_data":
                    arr = rng.uniform(0.0, 600.0, size=shape).astype(np.float32)
                elif name.endswith("_sin") or name.endswith("_cos"):
                    arr = rng.uniform(-1.0, 1.0, size=shape).astype(np.float32)
                elif name == "x":  # OSGB easting per column
                    arr = rng.uniform(0.0, 650_000.0, size=shape).astype(np.float32)
                elif name == "y":  # OSGB northing per row
                    arr = rng.uniform(0.0, 1_000_000.0, size=shape).astype(np.float32)
                elif name == "gsp_capacity":
                    arr = rng.uniform(10.0, 500.0, size=shape).astype(np.float32)
                elif name in ("pv_yield", "gsp_yield"):
                    arr = rng.uniform(0.0, 1.0, size=shape).astype(np.float32)
                else:  # imagery / nwp: roughly unit-normal like decoded data
                    arr = rng.standard_normal(size=shape).astype(np.float32)
            elif dtype == np.int32:
                # ID ranges sized to the smallest embedding table that consumes
                # them (940-way, reference model_sat_nwp.py:148-151).
                high = 940 if name == "pv_system_row_number" else 340
                arr = rng.integers(0, high, size=shape, dtype=np.int32)
            else:  # int64 datetimes: each axis advances at ITS cadence
                # (satellite/hrv 5-min, gsp 30-min, nwp targets 60-min) so
                # cross-modality time alignment on fake data behaves like
                # the schema says, not all-30-min
                steps = rng.integers(0, 2**16, size=shape[:1], dtype=np.int64)
                base = _T0_NS + steps * (30 * _NS_PER_MIN)
                if len(shape) == 1:
                    arr = base
                else:
                    cadence = _cadence_minutes(name)
                    idx = np.arange(shape[1], dtype=np.int64)
                    arr = base[:, None] + idx[None, :] * (cadence * _NS_PER_MIN)
            data[group][name] = arr
    return Batch.from_dict(data)


class FakeDataset:
    """Map-style dataset of random full batches.

    API-compatible with the slice of ``nowcasting_dataloader.fake.FakeDataset``
    the reference uses: construct with ``configuration=``, iterate or index,
    override ``.length`` (reference ``test_conv3d_model.py:54``).
    """

    def __init__(self, configuration, length: int = 10, seed: int = 0):
        self.configuration = configuration
        self.length = length
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int) -> Batch:
        if not 0 <= index < self.length:
            raise IndexError(index)
        rng = np.random.default_rng((self.seed, index))
        return fake_batch(self.configuration, rng)

    def __iter__(self) -> Iterator[Batch]:
        for i in range(self.length):
            yield self[i]


def fake_batch_on_device(configuration, seed: int = 0, sharding=None):
    """Synthesise a numeric Batch directly on device (for benchmarks).

    Datetime fields are omitted (they are host-side metadata). When a
    ``sharding`` is given, arrays are created already laid out over the mesh.
    """
    import jax
    import jax.numpy as jnp

    shapes = batch_shapes(configuration)

    def build(key):
        counter = iter(range(1_000))
        data: dict = {}
        for group, fields in shapes.items():
            data[group] = {}
            for name, shape in fields.items():
                dtype = field_dtype(name)
                if dtype == np.int64:
                    continue
                field_key = jax.random.fold_in(key, next(counter))
                if dtype == np.int32:
                    high = 940 if name == "pv_system_row_number" else 340
                    arr = jax.random.randint(field_key, shape, 0, high, jnp.int32)
                elif name in ("pv_yield", "gsp_yield"):
                    arr = jax.random.uniform(field_key, shape, jnp.float32)
                elif name == "gsp_capacity":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, 10.0, 500.0)
                elif name == "sun_elevation_angle":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, -10.0, 60.0)
                elif name == "sun_azimuth_angle":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, 0.0, 360.0)
                elif name == "topo_data":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, 0.0, 600.0)
                elif name.endswith("_sin") or name.endswith("_cos"):
                    arr = jax.random.uniform(field_key, shape, jnp.float32, -1.0, 1.0)
                elif name == "x":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, 0.0, 650_000.0)
                elif name == "y":
                    arr = jax.random.uniform(field_key, shape, jnp.float32, 0.0, 1_000_000.0)
                else:
                    # imagery / nwp: roughly unit-normal like decoded data —
                    # the same distributions as the host fake_batch so
                    # device benchmarks see representative numerics
                    arr = jax.random.normal(field_key, shape, jnp.float32)
                data[group][name] = arr
        return Batch.from_dict(data)

    fn = jax.jit(build, out_shardings=sharding) if sharding is not None else jax.jit(build)
    return fn(jax.random.key(seed))
