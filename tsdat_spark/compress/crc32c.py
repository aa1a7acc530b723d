"""CRC-32C (Castagnoli, RFC 3720 §B.4) — the checksum the zarr v3
``crc32c`` codec appends to each encoded chunk (4 bytes, little-endian).

From-spec table-driven implementation (reflected polynomial 0x82F63B78,
init/xorout 0xFFFFFFFF), slicing-by-8 so the Python loop advances 8 bytes
per iteration — ~8× the naive byte loop, adequate for the side-channel
chunk sizes this engine verifies (zarr chunks are O(100 KB–1 MB) and are
decoded inside Spark tasks, so the cost is distributed)."""

from __future__ import annotations

_POLY = 0x82F63B78

# slicing-by-8 tables: _T[0] is the classic byte table; _T[k][b] is the
# CRC contribution of byte b seen k positions earlier in the 8-byte word
_T = [[0] * 256 for _ in range(8)]
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _T[0][_b] = _c
for _b in range(256):
    _c = _T[0][_b]
    for _k in range(1, 8):
        _c = _T[0][_c & 0xFF] ^ (_c >> 8)
        _T[_k][_b] = _c
del _b, _c, _k


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C of ``data``; pass a prior return value as ``crc`` to chain."""
    crc ^= 0xFFFFFFFF
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    n = len(data) - (len(data) % 8)
    mv = memoryview(data)
    for i in range(0, n, 8):
        crc ^= int.from_bytes(mv[i : i + 4], "little")
        crc = (
            t7[crc & 0xFF]
            ^ t6[(crc >> 8) & 0xFF]
            ^ t5[(crc >> 16) & 0xFF]
            ^ t4[(crc >> 24) & 0xFF]
            ^ t3[data[i + 4]]
            ^ t2[data[i + 5]]
            ^ t1[data[i + 6]]
            ^ t0[data[i + 7]]
        )
    for i in range(n, len(data)):
        crc = t0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF
