"""Minimal from-spec HDF5 writer — NetCDF-4-flavored output without h5py.

Emits the complementary v1 profile to the fixture-covered v2 read path
(``io/hdf5.py``): superblock v0, v1 object headers, v1 symbol-table
groups (``TREE``/``HEAP``/``SNOD``), layouts contiguous and v3 chunked
(B-tree v1) with shuffle+deflate, fixed-string/numeric attributes, and
the netCDF-4 dimension-scale convention (``CLASS``/``NAME`` on the
coordinate variable, ``DIMENSION_LIST`` as VLEN object references through
a global heap) so netCDF readers recover real dimension names. Everything
follows the public HDF5 File Format Specification III; layout constants
(group leaf K=4 → ≤8 symbols per SNOD, single-level node caps) match the
library defaults the spec documents.

Role: (a) round-trip proof for the reader's v1/chunked/filtered paths —
the reference fixture only exercises v2 headers with contiguous storage;
(b) the engine's NetCDF-4 sink analog of ``NetCDF3DatasetWriter``
(one self-describing part per Spark partition via ``write_hdf5``).
Caps are explicit: one group level, ≤64 chunks per dataset (one B-tree
node), 1-D data variables — a ``ValueError`` names each.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF8 = b"\xff" * 8


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _dataspace(shape) -> bytes:
    return struct.pack("<BBB5x", 1, len(shape), 0) + b"".join(
        struct.pack("<Q", s) for s in shape
    )


def _datatype(kind: str, strlen: int = 0) -> bytes:
    if kind == "f8":
        return struct.pack("<B3BIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8, 0, 64, 52, 11, 0, 52, 1023)
    if kind == "f4":
        return struct.pack("<B3BIHHBBBBI", 0x11, 0x20, 0x1F, 0, 4, 0, 32, 23, 8, 0, 23, 127)
    if kind == "i8":
        return struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 8, 0, 64)
    if kind == "i4":
        return struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 4, 0, 32)
    if kind == "str":
        return struct.pack("<B3BI", 0x13, 0, 0, 0, strlen)
    if kind == "ref":
        return struct.pack("<B3BI", 0x17, 0, 0, 0, 8)
    if kind == "vlen_ref":
        return struct.pack("<B3BI", 0x19, 0, 0, 0, 16) + _datatype("ref")
    raise ValueError(f"unknown datatype kind {kind}")


_KIND_FOR = {"f8": "<f8", "f4": "<f4", "i8": "<i8", "i4": "<i4"}


def _value_bytes(value):
    """(datatype bytes, dataspace bytes, payload) for an attribute value."""
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        return _datatype("str", len(raw)), _dataspace(()), raw
    if isinstance(value, int):
        return _datatype("i8"), _dataspace(()), struct.pack("<q", value)
    if isinstance(value, float):
        return _datatype("f8"), _dataspace(()), struct.pack("<d", value)
    raise ValueError(f"unsupported attribute value {value!r}")


def _attr(name: str, dt: bytes, ds: bytes, payload: bytes) -> bytes:
    nm = name.encode() + b"\x00"
    head = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    return _msg(0x0C, head + _pad8(nm) + _pad8(dt) + _pad8(ds) + payload)


def _fill_undefined() -> bytes:
    return _msg(0x05, struct.pack("<BBBB", 2, 2, 0, 0))


def _ohdr_v1(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def _filters_shuffle_deflate(elem_size: int, level: int) -> bytes:
    ent = b""
    ent += struct.pack("<HHHHI4x", 2, 0, 0, 1, elem_size)   # shuffle
    ent += struct.pack("<HHHHI4x", 1, 0, 0, 1, level)       # deflate
    return _msg(0x0B, struct.pack("<BB6x", 1, 2) + ent)


def write_hdf5(
    columns: dict[str, np.ndarray],
    dim: str,
    global_attrs: dict | None = None,
    var_attrs: dict | None = None,
    chunk_rows: int | None = None,
    compress_level: int = 4,
) -> bytes:
    """Serialize aligned 1-D columns into one HDF5/NetCDF-4-style file.

    ``columns[dim]`` is the coordinate variable (written as a dimension
    scale); every other column gets a ``DIMENSION_LIST`` pointing at it.
    ``chunk_rows`` switches data variables to chunked shuffle+deflate
    storage (the dimension scale stays contiguous, like netcdf-c)."""
    global_attrs = dict(global_attrs or {})
    var_attrs = {k: dict(v) for k, v in (var_attrs or {}).items()}
    if dim not in columns:
        raise ValueError(f"dimension column {dim!r} missing")
    n = len(columns[dim])
    for name, a in columns.items():
        if a.ndim != 1 or len(a) != n:
            raise ValueError(f"column {name!r} is not an aligned 1-D array")

    names = sorted(columns)  # symbol tables are name-ordered
    prepared = {}
    for name in names:
        a = np.ascontiguousarray(columns[name])
        if a.dtype.kind == "M":  # CF time encoding, like the classic writer
            from .cf import encode_cf_micros

            a = encode_cf_micros(a)
            var_attrs.setdefault(name, {}).setdefault(
                "units", "microseconds since 1970-01-01 00:00:00"
            )
        if a.dtype.kind == "f":
            kind = "f8" if a.dtype.itemsize == 8 else "f4"
            a = a.astype(_KIND_FOR[kind])
        elif a.dtype.kind in ("i", "u"):
            kind = "i8" if a.dtype.itemsize >= 8 else "i4"
            a = a.astype(_KIND_FOR[kind])
        elif a.dtype.kind in ("U", "O", "S"):
            enc = np.array([str(x).encode() for x in a.tolist()])
            kind = "str"
            a = enc.astype(f"S{max(enc.dtype.itemsize, 1)}")
        else:
            raise ValueError(f"unsupported column dtype {a.dtype}")
        prepared[name] = (kind, a)

    # ---- plan the file layout (sizes first, then addresses) ---------------
    # heap: 8 reserved bytes, then each name nul-terminated, padded to 8
    heap_offsets, hoff = {}, 8
    for name in names:
        heap_offsets[name] = hoff
        hoff += len(_pad8(name.encode() + b"\x00"))
    heap_data_size = hoff

    n_per_snod = 8  # group leaf K = 4
    snod_groups = [names[i : i + n_per_snod] for i in range(0, len(names), n_per_snod)]
    btree_size = 24 + 8 * (2 * len(snod_groups) + 1)
    snod_size = 8 + 40 * n_per_snod

    off_heap_hdr = 96
    off_heap_data = off_heap_hdr + 32
    off_btree = off_heap_data + heap_data_size
    off_snods = off_btree + btree_size
    off_root_ohdr = off_snods + snod_size * len(snod_groups)

    root_msgs = [_msg(0x11, struct.pack("<QQ", off_btree, off_heap_hdr))]
    for k, v in global_attrs.items():
        dt, ds, payload = _value_bytes(v)
        root_msgs.append(_attr(k, dt, ds, payload))
    root_ohdr = _ohdr_v1(root_msgs)

    # ---- per-dataset: build messages with placeholder addresses, measure,
    # then assign data addresses and re-render -------------------------------
    cursor = off_root_ohdr + len(root_ohdr)
    ds_addr: dict[str, int] = {}
    renders: list[tuple[int, bytes]] = [(off_root_ohdr, root_ohdr)]
    gheap_objects: list[bytes] = []  # rendered later; one per DIMENSION_LIST

    data_blobs: dict[str, tuple] = {}
    for name in names:
        kind, a = prepared[name]
        use_chunks = chunk_rows is not None and name != dim and kind != "str"
        if use_chunks:
            nchunks = -(-n // chunk_rows) if n else 0
            if nchunks > 64:
                raise ValueError(
                    f"{name!r}: {nchunks} chunks exceeds the single-node "
                    "B-tree cap (64) — raise chunk_rows"
                )
            blobs = []
            for ci in range(nchunks):
                part = a[ci * chunk_rows : (ci + 1) * chunk_rows]
                if len(part) < chunk_rows:  # HDF5 stores full-size edge chunks
                    part = np.concatenate([part, np.zeros(chunk_rows - len(part), a.dtype)])
                raw = part.tobytes()
                es = a.dtype.itemsize
                shuf = np.frombuffer(raw, np.uint8).reshape(chunk_rows, es).T.tobytes()
                blobs.append(zlib.compress(shuf, compress_level))
            data_blobs[name] = ("chunked", blobs)
        else:
            data_blobs[name] = ("contiguous", a.tobytes())

    def dataset_ohdr(name, data_addr, gheap_addr, gheap_index):
        kind, a = prepared[name]
        es = a.dtype.itemsize
        msgs = [
            _msg(0x01, _dataspace((n,))),
            _msg(0x03, _datatype(kind, strlen=es if kind == "str" else 0)),
            _fill_undefined(),
        ]
        storage, payload = data_blobs[name]
        if storage == "chunked":
            msgs.append(_filters_shuffle_deflate(es, compress_level))
            msgs.append(_msg(0x08, struct.pack("<BBBQII", 3, 2, 2, data_addr,
                                               chunk_rows, es)))
        else:
            msgs.append(_msg(0x08, struct.pack("<BBQQ", 3, 1, data_addr, len(payload))))
        if name == dim:
            msgs.append(_attr("CLASS", *_value_bytes("DIMENSION_SCALE")))
            msgs.append(_attr("NAME", *_value_bytes(name)))
        else:
            vl = struct.pack("<IQI", 1, gheap_addr, gheap_index)
            msgs.append(_attr("DIMENSION_LIST", _datatype("vlen_ref"), _dataspace((1,)), vl))
        for k, v in var_attrs.get(name, {}).items():
            msgs.append(_attr(k, *_value_bytes(v)))
        return _ohdr_v1(msgs)

    # measure each ohdr with dummy addresses (sizes are address-independent)
    sizes = {name: len(dataset_ohdr(name, 0, 0, 1)) for name in names}

    # lay out: [ohdr][data] per dataset, then the global heap collection
    plan: dict[str, tuple] = {}
    for name in names:
        ohdr_at = cursor
        cursor += sizes[name]
        storage, payload = data_blobs[name]
        if storage == "chunked":
            blobs = payload
            btree_at = cursor
            key_sz = 8 + 8 * 2  # size+mask + (rank+1) offsets
            cursor += 24 + len(blobs) * (key_sz + 8) + key_sz
            chunk_at = []
            for b in blobs:
                chunk_at.append(cursor)
                cursor += len(b)
            plan[name] = (ohdr_at, btree_at, chunk_at)
        else:
            plan[name] = (ohdr_at, cursor, None)
            cursor += len(payload)
        ds_addr[name] = ohdr_at

    gheap_at = cursor
    gheap_size = 4096

    # render datasets with real addresses
    gheap_index = 0
    gheap_payloads = []
    for name in names:
        ohdr_at, data_at, chunk_at = plan[name]
        if name != dim:
            gheap_index += 1
            gheap_payloads.append(struct.pack("<Q", ds_addr[dim]))
            gi = gheap_index
        else:
            gi = 0
        body = dataset_ohdr(name, data_at, gheap_at, gi)
        assert len(body) == sizes[name]
        renders.append((ohdr_at, body))
        storage, payload = data_blobs[name]
        if storage == "chunked":
            node = bytearray(b"TREE" + struct.pack("<BBH", 1, 0, len(payload)))
            node += _UNDEF8 + _UNDEF8
            for ci, b in enumerate(payload):
                node += struct.pack("<IIQQ", len(b), 0, ci * chunk_rows, 0)
                node += struct.pack("<Q", chunk_at[ci])
            node += struct.pack("<IIQQ", 0, 0, n, 0)  # final key
            renders.append((data_at, bytes(node)))
            for ci, b in enumerate(payload):
                renders.append((chunk_at[ci], b))
        else:
            renders.append((data_at, payload))

    # global heap collection
    g = bytearray(b"GCOL" + struct.pack("<B3xQ", 1, gheap_size))
    for i, p in enumerate(gheap_payloads, start=1):
        g += struct.pack("<HH4xQ", i, 1, len(p)) + _pad8(p)
    free = gheap_size - len(g)
    g += struct.pack("<HH4xQ", 0, 0, free)  # free-space terminator
    g += b"\x00" * (gheap_size - len(g))
    renders.append((gheap_at, bytes(g)))
    eof = gheap_at + gheap_size

    # ---- fixed front matter ----------------------------------------------
    buf = bytearray(eof)
    sb = bytearray()
    sb += _SIG
    sb += struct.pack("<BBBxB BBx HH I", 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<Q", 0) + _UNDEF8 + struct.pack("<Q", eof) + _UNDEF8
    # root symbol table entry
    sb += struct.pack("<QQI4x16x", 0, off_root_ohdr, 0)
    assert len(sb) == 96
    buf[0:96] = sb

    heap_hdr = b"HEAP" + struct.pack("<B3xQQQ", 0, heap_data_size, 2**64 - 1 - 0, off_heap_data)
    buf[off_heap_hdr : off_heap_hdr + 32] = heap_hdr[:32]
    hdata = bytearray(b"\x00" * 8)
    for name in names:
        hdata += _pad8(name.encode() + b"\x00")
    buf[off_heap_data : off_heap_data + heap_data_size] = hdata

    bt = bytearray(b"TREE" + struct.pack("<BBH", 0, 0, len(snod_groups)))
    bt += _UNDEF8 + _UNDEF8
    bt += struct.pack("<Q", 0)  # key 0: offset of "" (≤ everything)
    for gi, group in enumerate(snod_groups):
        bt += struct.pack("<Q", off_snods + gi * snod_size)
        bt += struct.pack("<Q", heap_offsets[group[-1]])  # key: last name in child
    buf[off_btree : off_btree + len(bt)] = bt

    for gi, group in enumerate(snod_groups):
        sn = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(group)))
        for name in group:
            sn += struct.pack("<QQI4x16x", heap_offsets[name], ds_addr[name], 0)
        sn += b"\x00" * (snod_size - len(sn))
        buf[off_snods + gi * snod_size : off_snods + (gi + 1) * snod_size] = sn

    for off, blob in renders:
        buf[off : off + len(blob)] = blob
    return bytes(buf)


class NetCDF4DatasetWriter:
    """Engine sink: every partition becomes one NetCDF-4-style .nc part
    via :func:`write_hdf5` — the HDF5 twin of
    ``netcdf3.NetCDF3DatasetWriter`` (same per-partition render contract;
    ``chunk_rows`` turns on chunked shuffle+deflate storage)."""

    def __init__(self, attrs: dict | None = None, var_attrs: dict | None = None,
                 dim: str = "time", partitions: int | None = None,
                 chunk_rows: int | None = None, compress_level: int = 4):
        self.attrs = dict(attrs or {})
        self.var_attrs = {k: dict(v) for k, v in (var_attrs or {}).items()}
        self.dim = dim
        self.partitions = partitions
        self.chunk_rows = chunk_rows
        self.compress_level = compress_level

    def write(self, df, path: str) -> list:
        from .fs import write_binary_parts

        attrs, var_attrs, dim = self.attrs, self.var_attrs, self.dim
        chunk_rows, level = self.chunk_rows, self.compress_level

        def render_blob(pdf) -> bytes:
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            return write_hdf5(cols, dim=dim, global_attrs=attrs,
                              var_attrs=var_attrs, chunk_rows=chunk_rows,
                              compress_level=level)

        return write_binary_parts(df, path, render_blob, partitions=self.partitions)

    __call__ = write
