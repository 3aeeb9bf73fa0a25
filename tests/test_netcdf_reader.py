"""Prepared-batch NetCDF reading: v15 per-source HDF5 layout, legacy flat
files, the first-party netCDF3 classic parser, and the map-style dataset
(native equivalent of the external NetCDFDataset the reference wraps,
reference data/dataloader.py:97-115)."""

import struct

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from predict_pv_yield_tpu.data.netcdf_reader import (
    NetCDFBatchDataset,
    batch_from_legacy_file,
    batch_from_source_files,
    netcdf_filename,
    read_netcdf_variables,
    to_canonical_image,
)

B, C, T, H, W = 2, 4, 6, 8, 8


def _write_h5(path, variables):
    """xarray/h5netcdf-style file: datasets + dimension scales."""
    with h5py.File(path, "w") as fh:
        scales = {}
        for name, (dims, values) in variables.items():
            dset = fh.create_dataset(name, data=values)
            for axis, dim in enumerate(dims):
                if dim not in scales:
                    size = values.shape[axis]
                    scale = fh.create_dataset(dim, data=np.arange(size))
                    scale.make_scale(dim)
                    scales[dim] = scale
                dset.dims[axis].attach_scale(scales[dim])


def _v15_tree(tmp_path, batch_idx=0):
    rng = np.random.default_rng(0)
    root = tmp_path / "train"
    (root / "satellite").mkdir(parents=True, exist_ok=True)
    (root / "gsp").mkdir(exist_ok=True)
    (root / "metadata").mkdir(exist_ok=True)
    filename = netcdf_filename(batch_idx)

    # nowcasting_dataset writes satellite CHANNEL-LAST (example, time, y, x, c)
    sat = rng.integers(-1, 1023, (B, T, H, W, C)).astype(np.int16)
    _write_h5(
        root / "satellite" / filename,
        {
            "data": (
                ("example", "time_index", "y_geostationary_index",
                 "x_geostationary_index", "channels_index"),
                sat,
            ),
            "x_osgb": (("example", "x_geostationary_index"),
                       rng.normal(size=(B, W)).astype(np.float32)),
        },
    )
    gsp = rng.uniform(size=(B, 4, 3)).astype(np.float32)
    _write_h5(
        root / "gsp" / filename,
        {
            "power_mw": (("example", "time_index", "id_index"), gsp),
            "gsp_id": (("example", "id_index"),
                       np.arange(B * 3, dtype=np.int32).reshape(B, 3)),
            "capacity_mwp": (("example", "time_index", "id_index"),
                             np.ones((B, 4, 3), np.float32) * 50),
        },
    )
    _write_h5(
        root / "metadata" / filename,
        {"t0_datetime_utc": (("example",), np.arange(B, dtype=np.int64))},
    )
    return root, sat, gsp


def test_v15_per_source_layout(tmp_path):
    root, sat, gsp = _v15_tree(tmp_path)
    batch = batch_from_source_files(str(root), 0)
    # channel-last imagery ships AS-IS (zero-copy mmap view) with the
    # channel_last marker; the fused device preprocess transposes it —
    # a host-side transpose was the measured pipeline bottleneck
    assert batch.satellite.channel_last
    assert batch.satellite.data.shape == (B, T, H, W, C)
    assert batch.satellite.data.dtype == np.int16
    np.testing.assert_array_equal(batch.satellite.data, sat)
    # power_mw files carry raw MW; the Batch contract is the dataloader's
    # capacity-normalised [0,1] yield (de-normalised back to MW at
    # validation time via gsp_capacity, reference base_model.py:222-234)
    np.testing.assert_allclose(batch.gsp.gsp_yield, gsp / 50.0, rtol=1e-6)
    assert batch.gsp.gsp_id.shape == (B, 3)
    assert batch.gsp.gsp_capacity[0, 0, 0] == 50
    assert batch.metadata.t0_datetime_utc.shape == (B,)


def test_netcdf_batch_dataset(tmp_path):
    root, sat, _ = _v15_tree(tmp_path)
    _v15_tree(tmp_path, batch_idx=1)  # a second batch file really exists
    dataset = NetCDFBatchDataset(1, str(root))
    assert len(dataset) == 1
    batch = dataset[0]
    assert batch.satellite.data.shape == (B, T, H, W, C)
    assert batch.satellite.channel_last
    # the declared n_batches bounds the dataset even though 000001.nc is
    # on disk — IndexError comes from the length contract, not absence
    assert (root / "satellite" / netcdf_filename(1)).exists()
    with pytest.raises(IndexError):
        dataset[1]
    # and a dataset declared over both batches can read the second
    assert NetCDFBatchDataset(2, str(root))[1].satellite.data.shape == (B, T, H, W, C)


def test_legacy_single_file(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "000000.nc"
    sat = rng.integers(-1, 1023, (B, T, H, W, C)).astype(np.int16)
    pv = rng.uniform(size=(B, T, 5)).astype(np.float32)
    _write_h5(
        path,
        {
            "sat_data": (("example", "time", "y", "x", "channels"), sat),
            "pv_yield": (("example", "time", "pv_system"), pv),
            "pv_system_row_number": (
                ("example", "pv_system"),
                np.arange(B * 5, dtype=np.int32).reshape(B, 5),
            ),
            "hour_of_day_sin": (("example", "time"),
                                rng.uniform(size=(B, T)).astype(np.float32)),
        },
    )
    batch = batch_from_legacy_file(str(path))
    # channel-last wire deferred to the device transpose, like the v15 path
    assert batch.satellite.channel_last
    assert batch.satellite.data.shape == (B, T, H, W, C)
    np.testing.assert_array_equal(batch.pv.pv_yield, pv)
    assert batch.datetime.hour_of_day_sin.shape == (B, T)


def test_to_canonical_image_passthrough():
    # already canonical (B, C, T, H, W) named dims stay put
    values = np.zeros((2, 3, 4, 5, 5))
    dims = ("example", "channels_index", "time_index", "y_index", "x_index")
    assert to_canonical_image(dims, values).shape == (2, 3, 4, 5, 5)
    # unknown dims: untouched
    assert to_canonical_image(("a", "b", "c", "d", "e"), values).shape == values.shape


# ---------------------------------------------------------------------------
# netCDF3 classic parser
# ---------------------------------------------------------------------------


def _pad4(raw: bytes) -> bytes:
    return raw + b"\x00" * (-len(raw) % 4)


def _nc_name(name: str) -> bytes:
    encoded = name.encode()
    return struct.pack(">I", len(encoded)) + _pad4(encoded)


def _write_classic(path, fixed_vars, record_vars=(), numrecs=0, attrs_by_var=None):
    """Minimal netCDF3 classic writer (independent re-implementation of the
    format, so the parser is cross-checked rather than self-validated)."""
    dims = []  # (name, size); record dim has size 0
    dim_index = {}

    def dim_id(name, size):
        if name not in dim_index:
            dim_index[name] = len(dims)
            dims.append((name, size))
        return dim_index[name]

    entries = []
    for name, dim_spec, values in fixed_vars:
        ids = [dim_id(d, s) for d, s in zip(dim_spec, values.shape)]
        entries.append((name, ids, values, False))
    for name, dim_spec, values in record_vars:
        ids = [dim_id(dim_spec[0], 0)] + [
            dim_id(d, s) for d, s in zip(dim_spec[1:], values.shape[1:])
        ]
        entries.append((name, ids, values, True))

    nc_type = {np.dtype("i2"): 3, np.dtype("i4"): 4, np.dtype("f4"): 5,
               np.dtype("f8"): 6}

    header = b"CDF\x01" + struct.pack(">I", numrecs)
    header += struct.pack(">II", 0x0A, len(dims))
    for name, size in dims:
        header += _nc_name(name) + struct.pack(">I", size)
    header += struct.pack(">II", 0, 0)  # no global attrs

    def encode_attrs(var_name):
        attrs = (attrs_by_var or {}).get(var_name, {})
        if not attrs:
            return struct.pack(">II", 0, 0)  # ABSENT
        raw = struct.pack(">II", 0x0C, len(attrs))
        for attr_name, text in attrs.items():
            payload = text.encode()
            raw += _nc_name(attr_name) + struct.pack(">II", 2, len(payload))
            raw += _pad4(payload)
        return raw

    def encode_header(name, ids, values, is_record, begin):
        raw = _nc_name(name) + struct.pack(">I", len(ids))
        for i in ids:
            raw += struct.pack(">I", i)
        raw += encode_attrs(name)
        per = values[0].nbytes if is_record else values.nbytes
        raw += struct.pack(">II", nc_type[values.dtype], (per + 3) & ~3)
        return raw + struct.pack(">I", begin)

    # first pass with begin=0 just to measure the header size
    header_size = len(header) + 8 + sum(
        len(encode_header(n, i, v, r, 0)) for n, i, v, r in entries
    )

    # begins: fixed vars first, then the per-record slabs of the record zone
    ordered = []
    begin = header_size
    for name, ids, values, is_record in entries:
        ordered.append(None if is_record else begin)
        if not is_record:
            begin += (values.nbytes + 3) & ~3
    rec_offset = 0
    # spec: per-record slabs pad to 4 unless there is exactly one record var
    multiple = sum(1 for e in entries if e[3]) > 1
    for idx, (name, ids, values, is_record) in enumerate(entries):
        if is_record:
            ordered[idx] = begin + rec_offset
            per = values[0].nbytes
            rec_offset += (per + 3) & ~3 if multiple else per

    var_headers = b"".join(
        encode_header(n, i, v, r, b)
        for (n, i, v, r), b in zip(entries, ordered)
    )

    body = bytearray()
    for name, ids, values, is_record in entries:
        if not is_record:
            body += _pad4(values.astype(values.dtype.newbyteorder(">")).tobytes())
    for rec in range(numrecs):
        for name, ids, values, is_record in entries:
            if is_record:
                raw = values[rec].astype(values.dtype.newbyteorder(">")).tobytes()
                body += _pad4(raw) if multiple else raw

    with open(path, "wb") as fh:
        fh.write(header + struct.pack(">II", 0x0B, len(entries)) + var_headers + body)


def test_classic_netcdf_parser(tmp_path):
    path = str(tmp_path / "classic.nc")
    rng = np.random.default_rng(2)
    fixed = rng.normal(size=(3, 5)).astype(np.float32)
    short = np.arange(10, dtype=np.int16).reshape(2, 5)
    rec = rng.normal(size=(4, 3)).astype(np.float64)
    _write_classic(
        path,
        fixed_vars=[("fixed", ("a", "b"), fixed), ("short", ("c", "b"), short)],
        record_vars=[("rec", ("time", "d"), rec)],
        numrecs=4,
    )
    variables = read_netcdf_variables(path)
    np.testing.assert_allclose(variables["fixed"][1], fixed)
    np.testing.assert_array_equal(variables["short"][1], short)
    np.testing.assert_allclose(variables["rec"][1], rec)
    assert variables["fixed"][0] == ("a", "b")
    assert variables["rec"][0] == ("time", "d")


def test_classic_cf_time_units_decode(tmp_path):
    """xarray's scipy engine (the writer that actually produces classic
    files) stores datetimes as CF offsets + a per-variable ``units`` attr;
    the classic parser must decode them to ns-since-epoch exactly like the
    HDF5 path, not hand raw minute offsets downstream."""
    path = str(tmp_path / "classic_time.nc")
    offsets = (np.arange(4, dtype=np.int32) * 5).astype(np.int32)
    plain = np.arange(4, dtype=np.float32)
    _write_classic(
        path,
        fixed_vars=[
            ("sat_datetime_index", ("time",), offsets),
            ("other", ("time",), plain),
        ],
        attrs_by_var={
            "sat_datetime_index": {
                "units": "minutes since 2019-01-01 12:00:00"
            },
            "other": {"units": "degrees"},  # non-CF units stay raw
        },
    )
    variables = read_netcdf_variables(path)
    expected = (
        np.datetime64("2019-01-01T12:00", "ns").astype(np.int64)
        + offsets.astype(np.int64) * 60_000_000_000
    )
    np.testing.assert_array_equal(variables["sat_datetime_index"][1], expected)
    np.testing.assert_allclose(variables["other"][1], plain)


def test_datamodule_autodetects_netcdf(tmp_path):
    """The datamodule serves the reference's published NetCDF layout
    unmodified (VERDICT round-1 'real-archive compatibility' gap)."""
    from predict_pv_yield_tpu.data.loader import NetCDFDataModule

    root, sat, _ = _v15_tree(tmp_path)  # creates <tmp>/train/...
    # datamodule expects data_path/<split>; give it train for both splits
    import shutil

    shutil.copytree(tmp_path / "train", tmp_path / "test")
    (tmp_path / "configuration.yaml").write_text(
        "process:\n  batch_size: 2\n"
    )
    dm = NetCDFDataModule(
        data_path=str(tmp_path), temp_path=str(tmp_path / "tmp"),
        n_train_data=1, n_val_data=1, num_workers=0,
    )
    batch = next(iter(dm.train_dataloader()))
    assert batch.satellite.data.shape == (B, T, H, W, C)
    assert batch.satellite.channel_last
    assert batch.satellite.data.dtype == np.int16


def test_datamodule_remote_store(tmp_path):
    """A remote data_path (file:// stands in for gs://) works end to end:
    configuration.yaml is read through fsspec, the store is probed as the
    v15 NetCDF layout, and batches come back through the remote fetcher —
    the reference's gs:// workflow (``cloud='gcp'``)."""
    pytest.importorskip("fsspec")
    from predict_pv_yield_tpu.data.loader import NetCDFDataModule

    _v15_tree(tmp_path)
    import shutil

    shutil.copytree(tmp_path / "train", tmp_path / "test")
    (tmp_path / "configuration.yaml").write_text(
        "process:\n  batch_size: 2\n"
    )
    dm = NetCDFDataModule(
        data_path=f"file://{tmp_path}", temp_path=str(tmp_path / "cache"),
        n_train_data=1, n_val_data=1, num_workers=0,
    )
    assert dm.configuration.process.batch_size == 2
    batch = next(iter(dm.train_dataloader()))
    assert batch.satellite.data.shape == (B, T, H, W, C)
    assert batch.satellite.data.dtype == np.int16


def test_netcdf_dataset_remote_fetch(tmp_path):
    """Remote v15 store via fsspec (file://): source presence is probed once
    store-wide, every present source's file is fetched into tmp_path with
    parent creation, and the assembled batch matches the local read."""
    pytest.importorskip("fsspec")
    root, sat, gsp = _v15_tree(tmp_path)

    scratch = tmp_path / "cache"
    dataset = NetCDFBatchDataset(
        1, f"file://{root}", tmp_path=str(scratch)
    )
    batch = dataset[0]
    assert batch.satellite.channel_last
    np.testing.assert_array_equal(batch.satellite.data, sat)
    np.testing.assert_allclose(batch.gsp.gsp_yield, gsp / 50.0, rtol=1e-6)
    # presence cache: the probed sources are exactly the ones on disk
    assert set(dataset._sources_present()) == {"satellite", "gsp", "metadata"}
    # fetched copies live under tmp_path per source
    assert (scratch / "satellite" / netcdf_filename(0)).exists()
    # a second access reuses the cached local files (no error, same data)
    again = dataset[0]
    np.testing.assert_array_equal(again.satellite.data, batch.satellite.data)


def test_remote_missing_source_file_is_skipped(tmp_path):
    """A present source directory with no file for this batch (shorter
    source) is skipped — FileNotFoundError is not retried as transient."""
    pytest.importorskip("fsspec")
    root, _, _ = _v15_tree(tmp_path)
    (root / "topographic").mkdir()  # present source, but no 000000.nc

    import time

    t0 = time.perf_counter()
    dataset = NetCDFBatchDataset(1, f"file://{root}", tmp_path=str(tmp_path / "c2"))
    batch = dataset[0]
    elapsed = time.perf_counter() - t0
    assert batch.satellite.data is not None
    assert batch.topographic.topo_data is None
    assert elapsed < 10, f"missing file was retried as transient ({elapsed:.1f}s)"


def test_normalised_key_beats_power_mw(tmp_path):
    """A gsp file carrying BOTH a pre-normalised yield and raw power_mw
    keeps the normalised values (no iteration-order dependence, no double
    normalisation)."""
    root = tmp_path / "train"
    (root / "gsp").mkdir(parents=True)
    normalised = np.full((B, 4, 3), 0.25, np.float32)
    _write_h5(
        root / "gsp" / netcdf_filename(0),
        {
            "gsp_yield": (("example", "time_index", "id_index"), normalised),
            "power_mw": (("example", "time_index", "id_index"),
                         np.full((B, 4, 3), 500.0, np.float32)),
            "capacity_mwp": (("example", "time_index", "id_index"),
                             np.full((B, 4, 3), 1000.0, np.float32)),
        },
    )
    batch = batch_from_source_files(str(root), 0)
    np.testing.assert_allclose(batch.gsp.gsp_yield, normalised)


# ---------------------------------------------------------------------------
# h5netcdf-faithful conventions (VERDICT r2 #6): the writer reproduces real
# nowcasting_dataset/xarray byte conventions (dimension scales, phony-dim
# sentinels, _Netcdf4Dimid, CF-encoded datetimes, power_mw+capacity_mwp-only
# gsp files) and the reader must survive all of them.
# ---------------------------------------------------------------------------

from predict_pv_yield_tpu.data.netcdf_writer import (  # noqa: E402
    cf_encode_time,
    write_netcdf_variables,
    write_v15_batch,
)


def test_writer_emits_h5netcdf_conventions(tmp_path):
    path = str(tmp_path / "conv.nc")
    times = np.datetime64("2021-06-01T12:00", "ns") + np.arange(4) * np.timedelta64(
        5, "m"
    ).astype("timedelta64[ns]")
    write_netcdf_variables(
        path,
        {
            "data": (("example", "time"),
                     np.arange(8, dtype=np.float32).reshape(2, 4)),
            # dimension coordinate: shares the dim's name (xarray convention)
            "time": (("time",), times.astype("datetime64[ns]")),
        },
    )
    with h5py.File(path, "r") as fh:
        assert fh.attrs["_NCProperties"].startswith(b"version=2,h5netcdf")
        # "example" has no coordinate variable -> phony dimension scale
        example = fh["example"]
        assert example.attrs["CLASS"] == b"DIMENSION_SCALE"
        assert example.attrs["NAME"].startswith(
            b"This is a netCDF dimension but not a netCDF variable"
        )
        assert "_Netcdf4Dimid" in example.attrs
        # "time" IS a coordinate variable: named scale with CF attrs
        time = fh["time"]
        assert time.attrs["NAME"] == b"time"
        assert b"since" in bytes(time.attrs["units"], "utf-8") if isinstance(
            time.attrs["units"], str
        ) else b"since" in time.attrs["units"]
        # data var carries DIMENSION_LIST referencing both scales
        assert "DIMENSION_LIST" in fh["data"].attrs

    variables = read_netcdf_variables(path)
    # the phony "example" scale is structural — not returned as data
    assert "example" not in variables
    assert variables["data"][0] == ("example", "time")
    # CF time decoded back to exact int64 nanoseconds
    np.testing.assert_array_equal(
        variables["time"][1], times.astype("datetime64[ns]").astype(np.int64)
    )


def test_cf_time_roundtrip_exact():
    rng = np.random.default_rng(7)
    base = np.datetime64("2020-03-01T00:00", "ns").astype(np.int64)
    times = base + rng.integers(0, 10**6, size=(3, 5)) * 60_000_000_000
    offsets, attrs = cf_encode_time(times)
    from predict_pv_yield_tpu.data.netcdf_reader import _decode_cf_time

    decoded = _decode_cf_time(offsets, attrs["units"])
    np.testing.assert_array_equal(decoded, times)


def test_char_array_datetimes(tmp_path):
    """Legacy files carried string-typed datetimes; they must come back as
    int64 nanoseconds, not str objects."""
    path = str(tmp_path / "chars.nc")
    stamps = np.array(
        [["2021-01-01 12:00:00", "2021-01-01 12:05:00"],
         ["2021-01-02 00:00:00", "2021-01-02 00:05:00"]], dtype="S19"
    )
    write_netcdf_variables(
        path,
        {
            "sat_datetime_index": (("example", "time"), stamps),
            "label": (("example",), np.array([b"north", b"south"])),
        },
    )
    variables = read_netcdf_variables(path)
    expected = stamps.astype("U").astype("datetime64[s]").astype(
        "datetime64[ns]"
    ).astype(np.int64)
    np.testing.assert_array_equal(variables["sat_datetime_index"][1], expected)
    # non-time strings stay strings
    assert variables["label"][1].dtype.kind == "U"


def test_v15_batch_roundtrip(tmp_path, configuration):
    """write_v15_batch -> batch_from_source_files is the identity on every
    field the v15 layout stores (satellite int16 preserved channel-last on
    disk, pv/gsp renormalised from raw megawatts, CF datetimes exact)."""
    from predict_pv_yield_tpu.data.fake import fake_batch

    rng = np.random.default_rng(3)
    batch = fake_batch(configuration, rng)
    raw = rng.integers(-1, 1023, size=batch.satellite.data.shape, dtype=np.int16)
    batch = batch.replace(satellite=batch.satellite.replace(data=raw))

    root = str(tmp_path / "train")
    write_v15_batch(root, 0, batch)
    loaded = batch_from_source_files(root, 0)

    # satellite comes back in the channel-last wire layout with the marker;
    # the fused device preprocess owns the transpose
    assert loaded.satellite.channel_last
    np.testing.assert_array_equal(
        loaded.satellite.data, raw.transpose(0, 2, 3, 4, 1)
    )
    assert loaded.satellite.data.dtype == np.int16
    np.testing.assert_array_equal(
        loaded.satellite.datetime_index, batch.satellite.datetime_index
    )
    np.testing.assert_allclose(loaded.nwp.data, batch.nwp.data, rtol=1e-6)
    np.testing.assert_array_equal(loaded.nwp.target_time, batch.nwp.target_time)
    np.testing.assert_allclose(loaded.pv.pv_yield, batch.pv.pv_yield, atol=1e-6)
    np.testing.assert_array_equal(
        loaded.pv.pv_system_row_number, batch.pv.pv_system_row_number
    )
    np.testing.assert_allclose(loaded.gsp.gsp_yield, batch.gsp.gsp_yield, atol=1e-5)
    np.testing.assert_allclose(
        loaded.gsp.gsp_capacity, batch.gsp.gsp_capacity, rtol=1e-6
    )
    np.testing.assert_array_equal(loaded.gsp.gsp_id, batch.gsp.gsp_id)
    np.testing.assert_allclose(
        loaded.sun.sun_elevation_angle, batch.sun.sun_elevation_angle, rtol=1e-6
    )
    np.testing.assert_allclose(
        loaded.topographic.topo_data, batch.topographic.topo_data, rtol=1e-6
    )
    np.testing.assert_array_equal(
        loaded.metadata.t0_datetime_utc, batch.metadata.t0_datetime_utc
    )


def test_channel_last_device_decode_matches_host_transpose(tmp_path, configuration):
    """The deferred wire-layout transpose: preprocess_batch on a channel_last
    int16 batch must equal a host transpose followed by the canonical
    decode — bit-for-bit."""
    import jax.numpy as jnp

    from predict_pv_yield_tpu.consts import SAT_VARIABLE_NAMES
    from predict_pv_yield_tpu.data.batch import Batch, SatelliteBatch
    from predict_pv_yield_tpu.data.preprocess import preprocess_batch

    rng = np.random.default_rng(9)
    wire = rng.integers(-1, 1023, (2, 5, 8, 8, 4), dtype=np.int16)  # B,T,H,W,C
    names = SAT_VARIABLE_NAMES[1:5]

    deferred = Batch(
        satellite=SatelliteBatch(data=jnp.asarray(wire), channel_last=True)
    )
    canonical = Batch(
        satellite=SatelliteBatch(
            data=jnp.asarray(wire.transpose(0, 4, 1, 2, 3)), channel_last=False
        )
    )
    out_deferred = preprocess_batch(deferred, channel_names=names)
    out_canonical = preprocess_batch(canonical, channel_names=names)
    assert not out_deferred.satellite.channel_last
    np.testing.assert_array_equal(
        np.asarray(out_deferred.satellite.data),
        np.asarray(out_canonical.satellite.data),
    )


def test_train_epoch_from_netcdf_files(tmp_path, configuration_conv3d, tmp_cwd):
    """End-to-end: v15 NetCDF batch files (channel-last int16 wire) through
    NetCDFBatchDataset -> Trainer.fit, exercising the deferred device-side
    transpose inside the compiled train step."""
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch
    from predict_pv_yield_tpu.models.conv3d import Model
    from predict_pv_yield_tpu.training.engine import Trainer
    from predict_pv_yield_tpu.utils import load_config

    root = str(tmp_path / "train")
    for i in range(2):
        rng = np.random.default_rng(i)
        batch = fake_batch(configuration_conv3d, rng)
        raw = rng.integers(-1, 1023, size=batch.satellite.data.shape,
                           dtype=np.int16)
        batch = batch.replace(satellite=batch.satellite.replace(data=raw))
        write_v15_batch(root, i, batch)

    dataset = NetCDFBatchDataset(2, root)
    assert dataset[0].satellite.channel_last

    model_cfg = load_config("tests/configs/model/conv3d.yaml")
    model_cfg.pop("_target_", None)
    model = Model(**model_cfg)
    # steps_per_execution=2 also exercises the stacked (k, B, ...) transfer
    # and the scanned multi-step body with the channel_last static flag
    trainer = Trainer(max_epochs=1, profiler=None, steps_per_execution=2)
    metrics = trainer.fit(model, train_dataloaders=dataset)
    assert np.isfinite(metrics["NMAE/Train_epoch"])


def test_schema_cache_respects_per_file_time_epochs(tmp_path, configuration):
    """Regression (round-3 review): CF time units embed a PER-FILE epoch
    (xarray derives it from each file's first timestamp). The mmap schema
    cache must re-read units per file — caching batch 0's epoch decoded
    every later batch onto batch 0's timeline."""
    from predict_pv_yield_tpu.data.fake import fake_batch
    from predict_pv_yield_tpu.data.netcdf_writer import write_v15_batch

    root = str(tmp_path / "train")
    batches = []
    for i in range(2):
        rng = np.random.default_rng(100 + i)
        batches.append(fake_batch(configuration, rng))
        write_v15_batch(root, i, batches[i])

    dataset = NetCDFBatchDataset(2, root)
    first = dataset[0]   # probes + caches the schema
    second = dataset[1]  # must NOT inherit batch 0's epoch
    np.testing.assert_array_equal(
        first.metadata.t0_datetime_utc, batches[0].metadata.t0_datetime_utc
    )
    np.testing.assert_array_equal(
        second.metadata.t0_datetime_utc, batches[1].metadata.t0_datetime_utc
    )
    np.testing.assert_array_equal(
        second.satellite.datetime_index, batches[1].satellite.datetime_index
    )


def test_cf_encode_picks_coarsest_exact_unit():
    """Sub-minute timestamps must not be floored (round-3 review): the
    encoder picks the coarsest unit that represents every value exactly."""
    from predict_pv_yield_tpu.data.netcdf_reader import _decode_cf_time

    base = np.datetime64("2021-06-01T12:00:30", "ns").astype(np.int64)
    times = base + np.arange(3) * 60 * 1_000_000_000  # :30 offsets, 1-min grid
    offsets, attrs = cf_encode_time(times)
    # values sit on a 1-min grid shifted by 30 s -> minutes cannot represent
    # them exactly; seconds is the coarsest exact unit
    assert attrs["units"].startswith("seconds since"), attrs["units"]
    decoded = _decode_cf_time(offsets, attrs["units"])
    np.testing.assert_array_equal(decoded, times)


def test_schema_cache_date_only_epochs_stay_per_file(tmp_path):
    """Regression (round-3 high review, reproduced): date-only CF units
    ('days since 2021-01-07') decode fine but failed the old probe regex,
    so they were mis-cached as layout-STATIC values and every later file
    froze onto the probe file's epoch."""
    from predict_pv_yield_tpu.data.netcdf_writer import write_netcdf_variables

    root = tmp_path / "train"
    (root / "metadata").mkdir(parents=True)
    epochs = ["2021-01-07", "2021-03-02"]
    for i, epoch in enumerate(epochs):
        write_netcdf_variables(
            str(root / "metadata" / netcdf_filename(i)),
            {"t0_datetime_utc": (("example",), np.arange(2, dtype=np.int64),
                                 {"units": f"days since {epoch}"})},
        )
    dataset = NetCDFBatchDataset(2, str(root))
    first = dataset[0]
    second = dataset[1]
    day_ns = 86_400_000_000_000
    for batch, epoch in ((first, epochs[0]), (second, epochs[1])):
        origin = np.datetime64(epoch, "ns").astype(np.int64)
        np.testing.assert_array_equal(
            batch.metadata.t0_datetime_utc,
            origin + np.arange(2, dtype=np.int64) * day_ns,
        )


def test_float_cf_offsets_round_and_nat(tmp_path):
    """Float CF offsets (xarray's NaT encoding) round instead of floor, and
    NaN maps to the int64 NaT sentinel."""
    from predict_pv_yield_tpu.data.netcdf_reader import _decode_cf_time

    decoded = _decode_cf_time(
        np.array([0.0, 0.5, np.nan]), "hours since 2021-01-01 00:00:00"
    )
    origin = np.datetime64("2021-01-01", "ns").astype(np.int64)
    assert decoded[0] == origin
    assert decoded[1] == origin + 1_800_000_000_000  # 30 min, not floored to 0
    assert decoded[2] == np.iinfo(np.int64).min  # NaT
