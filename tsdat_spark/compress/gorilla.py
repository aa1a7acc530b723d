"""Gorilla-style time-series block compression (numpy-vectorized encoder).

Implements the two stream codecs of Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database" (VLDB 2015, §4.1):

- **timestamps**: delta-of-delta with the paper's variable-length buckets
  ('0' for dod=0, '10'+7b, '110'+9b, '1110'+12b) extended with a
  '1111'+64b escape (we store microseconds, the paper stored seconds);
- **values**: float64 XOR with leading-zero/significant-bit windows.
  Divergence from the paper, on purpose: the paper's "reuse previous
  window" control bit creates a sequential state chain that defeats
  vectorization, so every nonzero XOR stores its window explicitly
  ('1' + 5b leading + 6b sigbits + sigbits). ~2 bits/point more, but the
  whole encode is branch-free numpy.

Encoding is fully vectorized: every point maps to ≤2 (code, nbits) pairs;
codes become a (n, 64) bit matrix via ``np.unpackbits``, a broadcast mask
selects each code's last nbits, and ``np.packbits`` emits the stream — no
per-point Python loop. Decode walks the bit cursor sequentially (cold
path: decompression happens on targeted reads, not in the rollup hot loop).

Used by the cold-tier writer via ``applyInPandas`` over (series, day)
blocks — the Spark-side plumbing lives in ``tsdat_spark.io.coldstore``.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GOR1"


def _pack_codes(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack (uint64 code, nbits) pairs into a big-endian bitstream —
    vectorized (see module docstring)."""
    n = codes.size
    if n == 0:
        return b""
    bitmat = np.unpackbits(codes.astype(">u8").view(np.uint8).reshape(n, 8), axis=1)
    mask = np.arange(64)[None, :] >= (64 - lens[:, None])
    bits = bitmat[mask]  # row-major: each row contributes its last nbits, in order
    return np.packbits(bits).tobytes()


def _ts_codes(ts_us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Delta-of-delta bucket codes for int64 microsecond timestamps."""
    n = ts_us.size
    deltas = np.diff(ts_us)
    dod = np.diff(deltas) if n > 2 else np.empty(0, dtype=np.int64)

    m = dod.size
    codes = np.zeros((m, 2), dtype=np.uint64)
    lens = np.zeros((m, 2), dtype=np.uint8)

    zero = dod == 0
    b7 = ~zero & (dod >= -63) & (dod <= 64)
    b9 = ~zero & ~b7 & (dod >= -255) & (dod <= 256)
    b12 = ~zero & ~b7 & ~b9 & (dod >= -2047) & (dod <= 2048)
    b64 = ~(zero | b7 | b9 | b12)

    codes[zero, 0], lens[zero, 0] = 0b0, 1
    codes[b7, 0], lens[b7, 0] = 0b10, 2
    codes[b9, 0], lens[b9, 0] = 0b110, 3
    codes[b12, 0], lens[b12, 0] = 0b1110, 4
    codes[b64, 0], lens[b64, 0] = 0b1111, 4
    # payloads (offset-encoded within bucket range, two's complement for b64)
    codes[b7, 1], lens[b7, 1] = (dod[b7] + 63).astype(np.uint64), 7
    codes[b9, 1], lens[b9, 1] = (dod[b9] + 255).astype(np.uint64), 9
    codes[b12, 1], lens[b12, 1] = (dod[b12] + 2047).astype(np.uint64), 12
    codes[b64, 1], lens[b64, 1] = dod[b64].astype(np.int64).view(np.uint64), 64
    flat = lens.reshape(-1) > 0
    return codes.reshape(-1)[flat], lens.reshape(-1)[flat]


def _val_codes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """XOR codes for float64 values (explicit-window variant)."""
    bits = values.astype(np.float64).view(np.uint64)
    xors = bits[1:] ^ bits[:-1]
    m = xors.size
    codes = np.zeros((m, 2), dtype=np.uint64)
    lens = np.zeros((m, 2), dtype=np.uint8)

    zero = xors == 0
    codes[zero, 0], lens[zero, 0] = 0b0, 1

    nz = ~zero
    if nz.any():
        x = xors[nz]
        # Leading/trailing zero counts via an exact bit-matrix scan. NOT
        # float log2: casting a uint64 near 2**64 to float64 rounds UP to
        # exactly 2**64, making log2()==64 and lead==-1 (found by the
        # hypothesis round-trip property on xors spanning all 64 bits).
        bm = np.unpackbits(x.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
        lead = np.minimum(bm.argmax(axis=1), 31).astype(np.int64)  # 5-bit cap
        trail = bm[:, ::-1].argmax(axis=1).astype(np.int64)
        sig = 64 - lead - trail
        # header: '1' + 5b lead + 6b (sig-1)  → 12 bits
        header = (np.uint64(1) << np.uint64(11)) | (lead.astype(np.uint64) << np.uint64(6)) | (sig - 1).astype(np.uint64)
        codes[nz, 0], lens[nz, 0] = header, 12
        codes[nz, 1] = x >> trail.astype(np.uint64)
        lens[nz, 1] = sig.astype(np.uint8)
    flat = lens.reshape(-1) > 0
    return codes.reshape(-1)[flat], lens.reshape(-1)[flat]


def gorilla_encode(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode aligned (int64 µs timestamps, float64 values) into one block.

    NaN is a legal value (missing sample); timestamps must be sorted.
    """
    ts_us = np.ascontiguousarray(ts_us, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    if ts_us.size != values.size:
        raise ValueError("timestamps and values must align")
    n = ts_us.size
    head = struct.pack("<4sI", _MAGIC, n)
    if n == 0:
        return head
    first = struct.pack("<qQ", int(ts_us[0]), int(values.view(np.uint64)[0]))
    if n == 1:
        return head + first
    delta0 = struct.pack("<q", int(ts_us[1]) - int(ts_us[0]))
    tc, tl = _ts_codes(ts_us)
    vc, vl = _val_codes(values)
    ts_stream = _pack_codes(tc, tl)
    val_stream = _pack_codes(vc, vl)
    return head + first + delta0 + struct.pack("<I", len(ts_stream)) + ts_stream + val_stream


def _read_bits(bits: np.ndarray, pos: int, n: int) -> tuple[int, int]:
    v = 0
    for b in bits[pos : pos + n]:
        v = (v << 1) | int(b)
    return v, pos + n


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`gorilla_encode`."""
    magic, n = struct.unpack_from("<4sI", blob, 0)
    if magic != _MAGIC:
        raise ValueError("not a GOR1 block")
    off = 8
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    t0, v0 = struct.unpack_from("<qQ", blob, off)
    off += 16
    ts[0] = t0
    vals[0] = np.frombuffer(struct.pack("<Q", v0), np.float64)[0]
    if n == 1:
        return ts, vals
    (delta0,) = struct.unpack_from("<q", blob, off)
    off += 8
    (ts_len,) = struct.unpack_from("<I", blob, off)
    off += 4
    ts_bits = np.unpackbits(np.frombuffer(blob, np.uint8, count=ts_len, offset=off))
    val_bits = np.unpackbits(np.frombuffer(blob, np.uint8, offset=off + ts_len))

    ts[1] = t0 + delta0
    delta = delta0
    pos = 0
    for i in range(2, n):
        if ts_bits[pos] == 0:
            dod = 0
            pos += 1
        else:
            if ts_bits[pos + 1] == 0:  # '10'
                raw, pos = _read_bits(ts_bits, pos + 2, 7)
                dod = raw - 63
            elif ts_bits[pos + 2] == 0:  # '110'
                raw, pos = _read_bits(ts_bits, pos + 3, 9)
                dod = raw - 255
            elif ts_bits[pos + 3] == 0:  # '1110'
                raw, pos = _read_bits(ts_bits, pos + 4, 12)
                dod = raw - 2047
            else:  # '1111'
                raw, pos = _read_bits(ts_bits, pos + 4, 64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        ts[i] = ts[i - 1] + delta

    prev = int(v0)
    pos = 0
    for i in range(1, n):
        if val_bits[pos] == 0:
            pos += 1
        else:
            lead, pos = _read_bits(val_bits, pos + 1, 5)
            sig_m1, pos = _read_bits(val_bits, pos, 6)
            sig = sig_m1 + 1
            payload, pos = _read_bits(val_bits, pos, sig)
            trail = 64 - lead - sig
            prev = prev ^ (payload << trail)
        vals[i] = np.frombuffer(struct.pack("<Q", prev), np.float64)[0]
    return ts, vals
