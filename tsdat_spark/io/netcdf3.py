"""Pure-numpy NetCDF classic (CDF-1/CDF-2) codec + Spark reader/writer.

tsdat's most common input format is NetCDF (``tsdat/io/readers/
netcdf_reader.py:8-18``). The sandbox image has no netCDF4/h5py, but the
CLASSIC format needs none: CDF-1/2 is a fully-specified big-endian binary
layout (the public NetCDF Classic Format Specification — magic ``CDF\\x01``
/ ``CDF\\x02``, header of dim/attr/var lists, fixed-offset data section).
This module implements it from the spec:

- :func:`read_netcdf3` / :func:`write_netcdf3` — driver/executor-side codec
  (header parse, non-record + record variables incl. the single-record-var
  no-padding special case, NC_BYTE..NC_DOUBLE, NC_CHAR string matrices).
- :class:`NetCDF3Reader` — Spark scan: ``binaryFile`` per .nc file +
  ``mapInPandas`` decode, exposing the 1-D variables over a chosen
  dimension as columns (the tsdat time-series shape); per-file fan-out
  across executors exactly like :class:`~tsdat_spark.io.readers.A2eCSVReader`.
- :class:`NetCDF3DatasetWriter` — every partition writes one
  self-describing classic .nc part (CDF-2, 64-bit offsets), global +
  variable attributes included; timestamps encoded as CF-style
  ``microseconds since 1970-01-01`` int64.

HDF5-backed NetCDF-4 files (magic ``\\x89HDF``) dispatch to the from-spec
pure-Python HDF5 subset parser in ``io/hdf5.py`` (same result tuple), so
:class:`NetCDF3Reader` transparently reads classic AND NetCDF-4 inputs;
HDF5 structures outside that subset raise ``Hdf5Boundary`` naming the
feature.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession

_ABSENT = 0
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

#: nc_type -> (numpy dtype, size)
_NC_TYPES = {
    1: ("i1", 1),   # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_NP_TO_NC = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(n).decode()
        self.take(_pad4(n) - n)
        return s

    def values(self, nc_type: int, nelems: int):
        dt, size = _NC_TYPES[nc_type]
        raw = self.take(nelems * size)
        self.take(_pad4(nelems * size) - nelems * size)
        if nc_type == 2:
            return raw.decode(errors="replace")
        return np.frombuffer(raw, dtype=dt, count=nelems)


def _read_attrs(cur: _Cursor) -> dict:
    tag, n = cur.i4(), cur.i4()
    if tag == _ABSENT:
        return {}
    assert tag == _NC_ATTRIBUTE, f"bad attr tag {tag}"
    out = {}
    for _ in range(n):
        name = cur.name()
        nc_type = cur.i4()
        nelems = cur.i4()
        v = cur.values(nc_type, nelems)
        if isinstance(v, np.ndarray):
            # nelems=0 is spec-legal: keep as empty list (v[0] would crash)
            v = v[0].item() if v.size == 1 else v.tolist()
        out[name] = v
    return out


def read_netcdf3(data: bytes):
    """Decode a classic NetCDF blob → (dims, global_attrs, variables) where
    ``variables`` maps name -> dict(dims, attrs, array). NC_CHAR variables
    with a trailing string-length dim decode to arrays of python strings."""
    if data[:4] == b"\x89HDF":
        from .hdf5 import read_hdf5

        return read_hdf5(data)  # NetCDF-4: from-spec HDF5 subset parser
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError(f"not a classic NetCDF (CDF-1/2) blob: magic={data[:4]!r}")
    version = data[3]
    off_read = _Cursor.i8 if version == 2 else _Cursor.i4
    cur = _Cursor(data)
    cur.take(4)
    numrecs = cur.i4()

    dims: list[tuple[str, int]] = []
    tag, n = cur.i4(), cur.i4()
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dims.append((cur.name(), cur.i4()))
    gattrs = _read_attrs(cur)

    variables: dict[str, dict] = {}
    rec_vars: list[str] = []
    tag, n = cur.i4(), cur.i4()
    if tag == _NC_VARIABLE:
        for _ in range(n):
            name = cur.name()
            ndims = cur.i4()
            dimids = [cur.i4() for _ in range(ndims)]
            vattrs = _read_attrs(cur)
            nc_type = cur.i4()
            vsize = cur.i4()
            begin = off_read(cur)
            variables[name] = {
                "dims": [dims[i][0] for i in dimids],
                "dimids": dimids,
                "attrs": vattrs,
                "nc_type": nc_type,
                "vsize": vsize,
                "begin": begin,
            }
            if ndims and dims[dimids[0]][1] == 0:
                rec_vars.append(name)

    dim_len = dict(dims)

    def fixed_shape(v):
        return tuple(
            dim_len[d] if dim_len[d] != 0 else numrecs for d in v["dims"]
        )

    for name, v in variables.items():
        dt, size = _NC_TYPES[v["nc_type"]]
        shape = fixed_shape(v)
        if name not in rec_vars:
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(data, dtype=dt, count=count, offset=v["begin"]).reshape(shape)
        else:
            # record data: per record, each record var's vsize-padded slab in
            # var order — EXCEPT with exactly one record variable, where the
            # spec drops inter-record padding (contiguous read).
            if len(rec_vars) == 1:
                per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
                arr = np.frombuffer(
                    data, dtype=dt, count=numrecs * per_rec, offset=v["begin"]
                ).reshape(shape)
            else:
                recsize = sum(variables[rv]["vsize"] for rv in rec_vars)
                per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
                out = np.empty((numrecs, per_rec), dtype=dt)
                for r in range(numrecs):
                    off = v["begin"] + r * recsize
                    out[r] = np.frombuffer(data, dtype=dt, count=per_rec, offset=off)
                arr = out.reshape(shape)
        if v["nc_type"] == 2 and len(shape) >= 1:
            # char matrix (..., strlen) -> strings along the last dim
            if len(shape) >= 2:
                flat = arr.reshape(-1, shape[-1])
                strs = np.array([b"".join(row).decode(errors="replace").rstrip("\x00")
                                 for row in flat])
                arr = strs.reshape(shape[:-1])
            else:
                arr = np.array(b"".join(arr).decode(errors="replace").rstrip("\x00"))
        v["array"] = arr
        for k in ("dimids", "nc_type", "vsize", "begin"):
            v.pop(k)
    return dict(dims), gattrs, variables


def write_netcdf3(
    columns: dict[str, np.ndarray],
    dim: str = "time",
    global_attrs: dict | None = None,
    var_attrs: dict | None = None,
) -> bytes:
    """Encode 1-D columns (equal length) as a classic CDF-2 blob: one fixed
    dimension ``dim``; numeric dtypes map to NC types; unicode/object
    columns become NC_CHAR matrices over an extra string-length dim."""
    global_attrs = global_attrs or {}
    var_attrs = var_attrs or {}
    n = len(next(iter(columns.values())))
    dims: list[tuple[str, int]] = [(dim, n)]
    str_dims: dict[str, int] = {}

    prepared: dict[str, tuple[int, list[int], bytes]] = {}
    for name, arr in columns.items():
        a = np.asarray(arr)
        if a.dtype.kind in ("U", "O", "S"):
            s = np.array(["" if x is None else str(x) for x in a.tolist()])
            width = max(1, max((len(x.encode()) for x in s.tolist()), default=1))
            key = f"strlen_{width}"
            if key not in str_dims:
                str_dims[key] = len(dims)
                dims.append((key, width))
            mat = np.zeros((n, width), dtype="S1")
            for i, x in enumerate(s.tolist()):
                bs = x.encode()[:width]
                mat[i, : len(bs)] = np.frombuffer(bs, dtype="S1")
            prepared[name] = (2, [0, str_dims[key]], mat.tobytes())
        else:
            if a.dtype.kind == "M":
                from .cf import CF_EPOCH_US_UNITS, encode_cf_micros

                a = encode_cf_micros(a).astype(">f8")  # NaT -> NaN, not INT64_MIN
                var_attrs = {**var_attrs, name: {
                    **var_attrs.get(name, {}),
                    "units": CF_EPOCH_US_UNITS,
                }}
                nc_type = 6
            elif a.dtype == np.int64:
                # classic has no 64-bit int; store as double (53-bit exact —
                # fine for tier counters; documented loss boundary beyond)
                a = a.astype(">f8")
                nc_type = 6
            else:
                nc_type = _NP_TO_NC.get(a.dtype.name)
                if nc_type is None:
                    a = a.astype(">f8")
                    nc_type = 6
                else:
                    dt, _ = _NC_TYPES[nc_type]
                    a = a.astype(dt)
            # NaN-safe: nulls arrive as NaN in float arrays (Arrow), kept as-is
            prepared[name] = (nc_type, [0], a.tobytes())

    def name_bytes(s: str) -> bytes:
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))

    def attr_bytes(attrs: dict) -> bytes:
        if not attrs:
            return struct.pack(">ii", _ABSENT, 0)
        out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
        for k, v in attrs.items():
            out.append(name_bytes(k))
            if isinstance(v, str):
                b = v.encode()
                out.append(struct.pack(">ii", 2, len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b)))
            elif isinstance(v, (int, np.integer)):
                out.append(struct.pack(">iii", 4, 1, int(v)))
            else:
                out.append(struct.pack(">iid", 6, 1, float(v)))
        return b"".join(out)

    header = [b"CDF\x02", struct.pack(">i", 0)]  # numrecs=0: all vars fixed
    header.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
    for dname, dlen in dims:
        header.append(name_bytes(dname) + struct.pack(">i", dlen))
    header.append(attr_bytes(global_attrs))

    # variable headers need data offsets: build them with a placeholder pass
    var_entries = []
    for name, (nc_type, dimids, raw) in prepared.items():
        vsize = _pad4(len(raw))
        var_entries.append((name, nc_type, dimids, vsize, raw))

    def var_header(begin_by_name: dict[str, int]) -> bytes:
        out = [struct.pack(">ii", _NC_VARIABLE, len(var_entries))]
        for name, nc_type, dimids, vsize, _ in var_entries:
            out.append(name_bytes(name))
            out.append(struct.pack(">i", len(dimids)))
            out.extend(struct.pack(">i", d) for d in dimids)
            out.append(attr_bytes(var_attrs.get(name, {})))
            out.append(struct.pack(">ii", nc_type, vsize))
            out.append(struct.pack(">q", begin_by_name[name]))  # CDF-2: 64-bit
        return b"".join(out)

    fixed = b"".join(header)
    probe = var_header({name: 0 for name, *_ in var_entries})
    data_start = len(fixed) + len(probe)
    begins, off = {}, data_start
    for name, _, _, vsize, _ in var_entries:
        begins[name] = off
        off += vsize
    body = b"".join(raw + b"\x00" * (vsize - len(raw))
                    for _, _, _, vsize, raw in var_entries)
    return fixed + var_header(begins) + body


@dataclass(frozen=True)
class NetCDF3Reader:
    """Spark scan over classic .nc files: binaryFile per file (directory or
    glob fans out across executors) + mapInPandas decode. Exposes every
    variable whose FIRST dim is ``dim`` as a column; CF-style
    ``* since <epoch>`` time units decode to timestamps."""

    dim: str = "time"

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        import glob as _glob
        import os
        from typing import Iterator

        import pandas as pd

        if os.path.isdir(path):
            candidates = sorted(_glob.glob(os.path.join(path, "*.nc")))
            load_path = os.path.join(path, "*.nc")
        else:
            candidates = sorted(_glob.glob(path)) or [path]
            load_path = path
        if not candidates:
            raise ValueError(f"no .nc files under {path!r}")
        with open(candidates[0], "rb") as f:
            _, _, variables = read_netcdf3(f.read())
        dim = self.dim
        first_dims = [v["dims"][0] for v in variables.values() if v["dims"]]
        if dim not in first_dims and first_dims:
            # configured dim absent from this file: fall back to the
            # majority dimension (ties -> name order), so `.nc` inputs with
            # a different coordinate name (e.g. the reference fixture's
            # "index") still scan through the generic reader dispatch
            from collections import Counter

            dim = min(Counter(first_dims).items(), key=lambda kv: (-kv[1], kv[0]))[0]

        cols: list[tuple[str, str]] = []
        for name, v in variables.items():
            if not v["dims"] or v["dims"][0] != dim or len(v["dims"]) > 2:
                continue
            if len(v["dims"]) == 2 and v["array"].dtype.kind not in ("U", "O"):
                continue  # 2-D numeric: not a column (engine is 1-D relational)
            a = v["array"]
            units = str(v["attrs"].get("units", ""))
            if " since " in units:
                cols.append((name, "timestamp"))
            elif a.dtype.kind in ("U", "O"):  # O: HDF5 VLEN strings
                cols.append((name, "string"))
            elif a.dtype.kind == "i":
                cols.append((name, "long"))
            else:
                cols.append((name, "double"))
        # backtick-quote: NetCDF variable names may contain spaces
        schema = ", ".join(f"`{n}` {t}" for n, t in cols)
        want = dict(cols)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .cf import decode_cf_time

            for pdf in batches:
                for blob in pdf["content"]:
                    _, _, vs = read_netcdf3(bytes(blob))
                    nrows = max((len(v["array"]) for v in vs.values()
                                 if v["dims"] and v["dims"][0] == dim), default=0)
                    out = {}
                    for name, typ in want.items():
                        if name not in vs:  # later file missing a declared var
                            if typ == "string":
                                out[name] = pd.Series([None] * nrows, dtype="object")
                            elif typ == "timestamp":
                                out[name] = pd.Series([pd.NaT] * nrows,
                                                      dtype="datetime64[us]")
                            else:
                                out[name] = np.full(nrows, np.nan)
                            continue
                        a = vs[name]["array"]
                        if typ == "timestamp":
                            units = str(vs[name]["attrs"].get("units", ""))
                            out[name] = decode_cf_time(a, units)
                        elif typ == "long":
                            out[name] = a.astype("int64")
                        elif typ == "string":
                            out[name] = a.astype(object)
                        else:
                            out[name] = a.astype("float64")
                    yield pd.DataFrame(out)

        blobs = spark.read.format("binaryFile").load(load_path).select("content")
        return blobs.mapInPandas(parse, schema)


class NetCDF3DatasetWriter:
    """Engine sink: every partition becomes one classic CDF-2 .nc part
    (``tsdat/io/writers/netcdf_writer.py`` analog for the classic subset).
    Parts are rendered AND written inside each Spark task through the FS
    seam (``fs.write_binary_parts``); only (path, nbytes, rows) manifest
    rows return to the driver, so the driver is never on the data path.
    Attributes ride in the file itself."""

    def __init__(self, attrs: dict | None = None, var_attrs: dict | None = None,
                 dim: str = "time", partitions: int | None = None):
        self.attrs = dict(attrs or {})
        self.var_attrs = {k: dict(v) for k, v in (var_attrs or {}).items()}
        self.dim = dim
        self.partitions = partitions

    def write(self, df: DataFrame, path: str) -> list:
        from .fs import write_binary_parts

        attrs, var_attrs, dim = self.attrs, self.var_attrs, self.dim

        def render_blob(pdf) -> bytes:
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            return write_netcdf3(cols, dim=dim, global_attrs=attrs, var_attrs=var_attrs)

        return write_binary_parts(df, path, render_blob, partitions=self.partitions)

    __call__ = write
