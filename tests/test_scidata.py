"""Classic NetCDF3 + Zarr v2 codecs and their Spark readers/writers —
from-spec implementations (no netCDF4/zarr libs in image). Includes
hand-built spec goldens so a round-trip bug can't hide on both sides."""

import datetime as dt
import json
import os
import struct
import zlib

import numpy as np
import pytest

from tsdat_spark.io.netcdf3 import (
    NetCDF3DatasetWriter, NetCDF3Reader, read_netcdf3, write_netcdf3,
)
from tsdat_spark.io.zarr2 import (
    ZarrDatasetWriter, ZarrReader, read_zarr_array, read_zarr_meta,
)


def _nm(s):
    b = s.encode(); pad = (-len(b)) % 4
    return struct.pack(">i", len(b)) + b + b"\x00" * pad


def test_netcdf3_spec_golden_record_var():
    """Hand-built CDF-1 byte string straight from the NetCDF Classic Format
    Specification (UNLIMITED dim, one NC_INT record variable)."""
    hand = b"".join([
        b"CDF\x01",
        struct.pack(">i", 3),
        struct.pack(">ii", 0x0A, 1), _nm("t"), struct.pack(">i", 0),
        struct.pack(">ii", 0, 0),
        struct.pack(">ii", 0x0B, 1),
        _nm("x"), struct.pack(">i", 1), struct.pack(">i", 0),
        struct.pack(">ii", 0, 0),
        struct.pack(">ii", 4, 4),
        struct.pack(">i", 0),
    ])
    hand = hand[:-4] + struct.pack(">i", len(hand)) + struct.pack(">iii", 10, 20, 30)
    dims, gattrs, vs = read_netcdf3(hand)
    assert dims == {"t": 0} and gattrs == {}
    assert vs["x"]["array"].tolist() == [10, 20, 30]


def test_netcdf3_codec_roundtrip_and_hdf5_guard():
    cols = {
        "time": np.datetime64("2024-01-01T00:00:00.123456", "us")
        + np.arange(7) * np.timedelta64(90, "s"),
        "value": np.array([1.5, np.nan, -3.25, 7.0, 0.0, 2.0, 9.5]),
        "count32": np.arange(7, dtype="int32"),
        "label": np.array(["alpha", "", "gamma x", "d", "e", "ff", "g"], dtype=object),
    }
    blob = write_netcdf3(cols, global_attrs={"datastream": "a.b.c", "n": 7},
                         var_attrs={"value": {"units": "degC"}})
    dims, gattrs, vs = read_netcdf3(blob)
    assert gattrs == {"datastream": "a.b.c", "n": 7}
    assert vs["value"]["attrs"]["units"] == "degC"
    v = vs["value"]["array"]
    assert v[0] == 1.5 and np.isnan(v[1]) and v[-1] == 9.5
    assert vs["count32"]["array"].tolist() == list(range(7))
    assert vs["label"]["array"].tolist() == cols["label"].tolist()
    assert np.array_equal(vs["time"]["array"].astype("int64"),
                          cols["time"].astype("int64"))
    with pytest.raises(ValueError, match="HDF5-backed"):
        read_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 16)


def test_netcdf3_spark_roundtrip(spark, tmp_path):
    base = dt.datetime(2024, 2, 1)
    rows = [(base + dt.timedelta(minutes=i), float(i) * 0.5, f"s{i % 3}", i * 7)
            for i in range(200)]
    df = spark.createDataFrame(rows, "time timestamp, temp double, tag string, n bigint")
    out = str(tmp_path / "nc_out")
    NetCDF3DatasetWriter(attrs={"datastream": "x.nc.b1"},
                         var_attrs={"temp": {"units": "degC"}},
                         partitions=3).write(df, out)
    assert len([f for f in os.listdir(out) if f.endswith(".nc")]) == 3
    back = NetCDF3Reader().read(spark, out)
    got = sorted((r["time"], r["temp"], r["tag"], r["n"]) for r in back.collect())
    exp = sorted(rows)
    assert len(got) == 200
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1] and g[2] == e[2]
        assert g[3] == e[3]  # int64 survives via 53-bit-exact double


def test_zarr_spec_golden_zlib():
    """Hand-built zarr v2 array (json + zlib chunk files) from the spec."""
    import tempfile
    d = tempfile.mkdtemp()
    adir = os.path.join(d, "x"); os.makedirs(adir)
    with open(os.path.join(adir, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [5], "chunks": [2],
                   "dtype": "<f8", "compressor": {"id": "zlib", "level": 1},
                   "fill_value": None, "filters": None, "order": "C"}, f)
    full = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    for ci in range(3):
        chunk = np.zeros(2); chunk[: len(full[ci*2:ci*2+2])] = full[ci*2:ci*2+2]
        with open(os.path.join(adir, str(ci)), "wb") as f:
            f.write(zlib.compress(chunk.astype("<f8").tobytes(), 1))
    assert read_zarr_array(adir).tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]
    meta, _ = read_zarr_meta(adir)
    assert meta["chunks"] == [2]


def test_zarr_blosc_boundary():
    ref = "/root/reference/test/io/data/input.zarr/index"
    if not os.path.exists(os.path.join(ref, ".zarray")):
        pytest.skip("reference zarr fixture absent")
    with pytest.raises(ValueError, match="blosc"):
        read_zarr_array(ref)


def test_zarr_spark_roundtrip(spark, tmp_path):
    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(seconds=i), float(i) ** 0.5, f"conv{i % 5}", i)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "time timestamp, v double, conv string, i bigint")
    out = str(tmp_path / "store.zarr")
    ZarrDatasetWriter(chunk_rows=128, order_by=["time"],
                      attrs={"datastream": "z.b1"},
                      var_attrs={"v": {"units": "1"}}).write(df, out)
    # layout: group + one dir per column + full-width padded chunks
    assert json.load(open(os.path.join(out, ".zgroup"))) == {"zarr_format": 2}
    meta, attrs = read_zarr_meta(os.path.join(out, "v"))
    assert meta["shape"] == [1000] and meta["chunks"] == [128]
    assert attrs["_ARRAY_DIMENSIONS"] == ["time"] and attrs["units"] == "1"
    assert read_zarr_array(os.path.join(out, "v"))[0] == 0.0

    back = ZarrReader().read(spark, out)
    got = sorted((r["time"], r["v"], r["conv"], r["i"]) for r in back.collect())
    assert len(got) == 1000
    for g, e in zip(got, sorted(rows)):
        assert g == e


def test_default_dispatch_and_yaml_wiring(spark, tmp_path):
    """'.nc' and '.zarr' inputs route through the default reader dispatch;
    the yaml storage map selects the classic writers (SURVEY §2.1 rows 3-4,
    §2.2 rows 11/15/19, classic-format subset)."""
    from tsdat_spark.io.readers import read_input
    from tsdat_spark.yaml_config import _parse_storage

    base = dt.datetime(2024, 4, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(minutes=i), float(i)) for i in range(40)],
        "time timestamp, v double",
    )
    ncdir = str(tmp_path / "ncdir")
    NetCDF3DatasetWriter(partitions=2).write(df, ncdir)
    one = os.path.join(ncdir, sorted(os.listdir(ncdir))[0])
    assert read_input(spark, one).count() > 0

    zdir = str(tmp_path / "disp.zarr")
    ZarrDatasetWriter(chunk_rows=16, order_by=["time"]).write(df, zdir)
    assert read_input(spark, zdir).count() == 40

    assert _parse_storage({"handler": {"classname": "tsdat.io.handlers.NetCDFHandler"}}).format == "netcdf"
    assert _parse_storage({"handler": {"writer": {"classname": "x.ZarrWriter"}}}).format == "zarr"


def test_zarr_null_int_widening(spark, tmp_path):
    """An int column containing NULLs is stored as <f8 with NaN holes and
    reads back with the NULLs intact (Arrow masks NaN as SQL NULL); an
    all-present int column stays <i8."""
    df = spark.createDataFrame(
        [(1, 10, None), (2, 20, 7), (3, 30, None)],
        "i bigint, full bigint, holey bigint",
    )
    out = str(tmp_path / "nulls.zarr")
    ZarrDatasetWriter(chunk_rows=2, order_by=["i"]).write(df, out)
    assert read_zarr_meta(os.path.join(out, "full"))[0]["dtype"] == "<i8"
    assert read_zarr_meta(os.path.join(out, "holey"))[0]["dtype"] == "<f8"
    back = ZarrReader().read(spark, out)
    rows = {r["i"]: r for r in back.collect()}
    assert rows[1]["holey"] is None and rows[3]["holey"] is None
    assert rows[2]["holey"] == 7.0 and rows[2]["full"] == 20
