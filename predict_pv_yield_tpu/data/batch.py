"""The ``Batch`` pytree — the framework's core data contract.

Native equivalent of the external ``nowcasting_dataloader.batch.BatchML``
container. Field names exactly match the slice of the BatchML API the
reference consumes (reference ``base_model.py:92-94,197-234``,
``models/conv3d/model_sat_nwp.py:181-255``, ``models/perceiver/perceiver.py:119-190``):

* ``batch.satellite.data``            — (B, C, T5, H, W)
* ``batch.nwp.data``                  — (B, C, T60, Hn, Wn)
* ``batch.pv.pv_yield``               — (B, T5, n_pv_systems)
* ``batch.pv.pv_system_row_number``   — (B, n_pv_systems) int32
* ``batch.gsp.gsp_yield``             — (B, T30, n_gsp)
* ``batch.gsp.gsp_id``                — (B, n_gsp) int32
* ``batch.gsp.gsp_capacity``          — (B, T30, n_gsp)
* ``batch.gsp.gsp_datetime_index``    — (B, T30) int64 ns-since-epoch (host only)
* ``batch.metadata.t0_datetime_utc``  — (B,) int64 ns-since-epoch (host only)

Unlike BatchML (a pydantic model of torch tensors), ``Batch`` is a registered
JAX pytree (``flax.struct.dataclass``): it flows through ``jit`` / ``pjit`` /
``shard_map`` and can be sharded over a device mesh with a single
``NamedSharding``. Datetime fields are int64 and live on the host — TPUs run
with 32-bit ints; ``Batch.numeric()`` returns a device-safe view with those
fields dropped, which is what the jitted train/eval steps consume.

Dict-style access mirrors the reference's duck typing: models there call
``x[self.output_variable]`` and ``x["nwp"]`` (reference ``model.py:131,141``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import struct

Array = Any  # jnp.ndarray or np.ndarray — the pytree is backend-agnostic.


@struct.dataclass
class SatelliteBatch:
    data: Optional[Array] = None  # (B, C, T5, H, W) float32 or int16 (undecoded)
    x: Optional[Array] = None  # (B, W) OSGB easting per column
    y: Optional[Array] = None  # (B, H) OSGB northing per row
    datetime_index: Optional[Array] = None  # (B, T5) int64 ns
    #: static marker: ``data`` is still in the channel-LAST wire layout
    #: (B, T5, H, W, C) exactly as nowcasting_dataset wrote it. The fused
    #: on-device preprocess transposes it to canonical for free (one HBM
    #: pass); doing it on the host costs a serial strided copy of the whole
    #: payload per batch (measured: it halved the NetCDF pipeline rate).
    channel_last: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class NWPBatch:
    data: Optional[Array] = None  # (B, C, T60, Hn, Wn) float32
    target_time: Optional[Array] = None  # (B, T60) int64 ns


@struct.dataclass
class PVBatch:
    pv_yield: Optional[Array] = None  # (B, T5, n_systems) float32 in [0, 1]
    pv_system_row_number: Optional[Array] = None  # (B, n_systems) int32
    pv_system_id: Optional[Array] = None  # (B, n_systems) int32


@struct.dataclass
class GSPBatch:
    gsp_yield: Optional[Array] = None  # (B, T30, n_gsp) float32 in [0, 1]
    gsp_id: Optional[Array] = None  # (B, n_gsp) int32
    gsp_capacity: Optional[Array] = None  # (B, T30, n_gsp) float32 MW
    gsp_datetime_index: Optional[Array] = None  # (B, T30) int64 ns (host only)


@struct.dataclass
class HRVSatelliteBatch:
    """High-resolution visible channel (own grid; BatchML carries it as a
    separate group — unused by the reference's models but part of the batch
    schema)."""

    data: Optional[Array] = None  # (B, 1, T5, Hh, Wh)
    x: Optional[Array] = None
    y: Optional[Array] = None
    #: see SatelliteBatch.channel_last
    channel_last: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class SunBatch:
    """Solar geometry series (BatchML ``sun`` group)."""

    sun_elevation_angle: Optional[Array] = None  # (B, T5) degrees
    sun_azimuth_angle: Optional[Array] = None  # (B, T5) degrees


@struct.dataclass
class TopographicBatch:
    """Static elevation map (BatchML ``topographic`` group)."""

    topo_data: Optional[Array] = None  # (B, Ht, Wt) metres


@struct.dataclass
class DatetimeBatch:
    """Cyclic datetime features at 5-minute cadence (consumed by the
    experiment models, reference ``experiments/001...py:320-342``)."""

    hour_of_day_sin: Optional[Array] = None  # (B, T5)
    hour_of_day_cos: Optional[Array] = None  # (B, T5)
    day_of_year_sin: Optional[Array] = None  # (B, T5)
    day_of_year_cos: Optional[Array] = None  # (B, T5)


@struct.dataclass
class Metadata:
    t0_datetime_utc: Optional[Array] = None  # (B,) int64 ns (host only)


@struct.dataclass
class Batch:
    satellite: SatelliteBatch = struct.field(default_factory=SatelliteBatch)
    hrvsatellite: HRVSatelliteBatch = struct.field(default_factory=HRVSatelliteBatch)
    nwp: NWPBatch = struct.field(default_factory=NWPBatch)
    pv: PVBatch = struct.field(default_factory=PVBatch)
    gsp: GSPBatch = struct.field(default_factory=GSPBatch)
    sun: SunBatch = struct.field(default_factory=SunBatch)
    topographic: TopographicBatch = struct.field(default_factory=TopographicBatch)
    datetime: DatetimeBatch = struct.field(default_factory=DatetimeBatch)
    metadata: Metadata = struct.field(default_factory=Metadata)

    # --- dict-style access (reference model.py:131,141 duck typing) ---------
    def __getitem__(self, key: str) -> Array:
        if key == "pv_yield":
            return self.pv.pv_yield
        if key == "gsp_yield":
            return self.gsp.gsp_yield
        if key == "nwp":
            return self.nwp.data
        if key == "satellite":
            return self.satellite.data
        raise KeyError(key)

    # --- host/device split ---------------------------------------------------
    def numeric(self) -> "Batch":
        """A device-safe view: int64 datetime fields dropped (TPU is 32-bit)."""
        return self.replace(
            satellite=self.satellite.replace(datetime_index=None),
            nwp=self.nwp.replace(target_time=None),
            gsp=self.gsp.replace(gsp_datetime_index=None),
            metadata=Metadata(),
        )

    @property
    def batch_size(self) -> int:
        for leaf in jax.tree_util.tree_leaves(self):
            return int(leaf.shape[0])
        raise ValueError("empty Batch")

    # --- construction ---------------------------------------------------------
    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Batch":
        """Promote a nested dict (the loader wire format) to a Batch, mirroring
        the reference's ``if type(x) == dict: x = BatchML(**x)`` idiom
        (reference ``base_model.py:84-85``)."""
        def build(struct_cls, sub: Dict[str, Any]):
            names = {f.name for f in struct_cls.__dataclass_fields__.values()}
            unknown = (sub or {}).keys() - names
            if unknown:
                # the reference's BatchML(**x) raises on unexpected fields —
                # silently dropping a typo'd key would train without that
                # input and surface (at best) as a NoneType error far away
                raise TypeError(
                    f"{struct_cls.__name__} got unknown fields "
                    f"{sorted(unknown)}; known: {sorted(names)}"
                )
            return struct_cls(**(sub or {}))

        return cls(
            satellite=build(SatelliteBatch, data.get("satellite", {})),
            hrvsatellite=build(HRVSatelliteBatch, data.get("hrvsatellite", {})),
            sun=build(SunBatch, data.get("sun", {})),
            topographic=build(TopographicBatch, data.get("topographic", {})),
            nwp=build(NWPBatch, data.get("nwp", {})),
            pv=build(PVBatch, data.get("pv", {})),
            gsp=build(GSPBatch, data.get("gsp", {})),
            datetime=build(DatetimeBatch, data.get("datetime", {})),
            metadata=build(Metadata, data.get("metadata", {})),
        )


def as_batch(x: Any) -> Batch:
    """Accept a Batch or a nested dict (reference duck-typing contract)."""
    if isinstance(x, Batch):
        return x
    if isinstance(x, dict):
        return Batch.from_dict(x)
    raise TypeError(f"cannot promote {type(x)} to Batch")


def batch_shapes(configuration) -> Dict[str, Dict[str, tuple]]:
    """Static shapes of every Batch field implied by a dataset Configuration.

    This is the single source of shape truth for the fake backend, the shard
    readers, and the compile-check entry points.
    """
    from predict_pv_yield_tpu.seqlen import SeqLens

    input_data = configuration.input_data
    batch_size = configuration.process.batch_size

    def lens(source) -> SeqLens:
        history = source.history_minutes
        forecast = source.forecast_minutes
        if history is None:
            history = input_data.default_history_minutes
        if forecast is None:
            forecast = input_data.default_forecast_minutes
        return SeqLens(history, forecast)

    sat = input_data.satellite
    hrv = input_data.hrvsatellite
    nwp = input_data.nwp
    pv = input_data.pv
    gsp = input_data.gsp

    hrv_lens = lens(hrv)
    sat_lens = lens(sat)
    nwp_lens = lens(nwp)
    pv_lens = lens(pv)
    gsp_lens = lens(gsp)

    n_pv = pv.n_pv_systems_per_example
    n_gsp = gsp.n_gsp_per_example

    return {
        "satellite": {
            "data": (
                batch_size,
                len(sat.satellite_channels),
                sat_lens.seq_len_5,
                sat.satellite_image_size_pixels,
                sat.satellite_image_size_pixels,
            ),
            "x": (batch_size, sat.satellite_image_size_pixels),
            "y": (batch_size, sat.satellite_image_size_pixels),
            "datetime_index": (batch_size, sat_lens.seq_len_5),
        },
        "hrvsatellite": {
            "data": (
                batch_size,
                len(hrv.hrvsatellite_channels),
                hrv_lens.seq_len_5,
                hrv.hrvsatellite_image_size_pixels,
                hrv.hrvsatellite_image_size_pixels,
            ),
        },
        "sun": {
            "sun_elevation_angle": (batch_size, sat_lens.seq_len_5),
            "sun_azimuth_angle": (batch_size, sat_lens.seq_len_5),
        },
        "topographic": {
            "topo_data": (
                batch_size,
                input_data.topographic.topographic_image_size_pixels,
                input_data.topographic.topographic_image_size_pixels,
            ),
        },
        "nwp": {
            "data": (
                batch_size,
                len(nwp.nwp_channels),
                nwp_lens.seq_len_60,
                nwp.nwp_image_size_pixels,
                nwp.nwp_image_size_pixels,
            ),
            "target_time": (batch_size, nwp_lens.seq_len_60),
        },
        "pv": {
            "pv_yield": (batch_size, pv_lens.seq_len_5, n_pv),
            "pv_system_row_number": (batch_size, n_pv),
            "pv_system_id": (batch_size, n_pv),
        },
        "gsp": {
            "gsp_yield": (batch_size, gsp_lens.seq_len_30, n_gsp),
            "gsp_id": (batch_size, n_gsp),
            "gsp_capacity": (batch_size, gsp_lens.seq_len_30, n_gsp),
            "gsp_datetime_index": (batch_size, gsp_lens.seq_len_30),
        },
        "datetime": {
            "hour_of_day_sin": (batch_size, sat_lens.seq_len_5),
            "hour_of_day_cos": (batch_size, sat_lens.seq_len_5),
            "day_of_year_sin": (batch_size, sat_lens.seq_len_5),
            "day_of_year_cos": (batch_size, sat_lens.seq_len_5),
        },
        "metadata": {"t0_datetime_utc": (batch_size,)},
    }


_INT32_FIELDS = {"pv_system_row_number", "pv_system_id", "gsp_id"}
_INT64_FIELDS = {"datetime_index", "target_time", "gsp_datetime_index", "t0_datetime_utc"}


def field_dtype(name: str) -> np.dtype:
    if name in _INT32_FIELDS:
        return np.dtype(np.int32)
    if name in _INT64_FIELDS:
        return np.dtype(np.int64)
    return np.dtype(np.float32)
