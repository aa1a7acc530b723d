"""XXH64 (Yann Collet's xxHash, public spec/reference implementation) —
the checksum zstd frames carry: RFC 8878 §3.1.1 Content_Checksum is the
low 32 bits of XXH64(decoded content, seed=0). Round 5 skipped the
4 checksum bytes; with this module the decoder VERIFIES them and the
encoder can emit them (``zstd_compress(..., checksum=True)``), both
cross-checked against the zstd CLI in ``tests/test_zstd_enc.py``.

Pure Python, one pass, ~15-20 MB/s — the same task-side cost class as the
from-spec zstd decode it guards.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        nstripes = n // 32
        lanes = struct.unpack_from(f"<{nstripes * 4}Q", data)
        for s in range(0, nstripes * 4, 4):
            v1 = _round(v1, lanes[s])
            v2 = _round(v2, lanes[s + 1])
            v3 = _round(v3, lanes[s + 2])
            v4 = _round(v4, lanes[s + 3])
        i = nstripes * 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        lane = struct.unpack_from("<Q", data, i)[0]
        h = (_rotl(h ^ _round(0, lane), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        lane = struct.unpack_from("<I", data, i)[0]
        h = (_rotl(h ^ (lane * _P1) & _M, 23) * _P2 + _P3) & _M
        h &= _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h
