"""Zarr v3 sharding_indexed (ZEP 2) — read and write.

zarr-python 3 shards large arrays by default in several configurations:
each stored object packs a grid of inner chunks plus a trailing
(offset, nbytes) uint64 index (crc32c-suffixed). The engine writes shards
task-side (`ZarrDatasetWriter(shards=...)`) and decodes them through the
same normalized meta path as plain v3 chunks.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import numpy as np
import pytest

from tsdat_spark.compress.crc32c import crc32c
from tsdat_spark.io.zarr2 import (
    ZarrDatasetWriter,
    ZarrReader,
    read_zarr_array,
    read_zarr_meta,
)


def _write_hand_shard(adir: str, values: np.ndarray, shard_w: int, inner_w: int,
                      index_location: str = "end", drop_inner: set | None = None):
    """Hand-build a sharded v3 array byte-for-byte from the spec (no engine
    writer involved) — gzip inner chain, full-grid index, crc32c index."""
    import gzip

    os.makedirs(os.path.join(adir, "c"), exist_ok=True)
    meta = {
        "zarr_format": 3, "node_type": "array", "shape": [len(values)],
        "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [shard_w]}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": -1.0,
        "codecs": [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [inner_w],
                "codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "gzip", "configuration": {"level": 5}},
                ],
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "crc32c", "configuration": {}},
                ],
                "index_location": index_location,
            },
        }],
        "attributes": {},
    }
    with open(os.path.join(adir, "zarr.json"), "w") as f:
        json.dump(meta, f)
    n_inner = shard_w // inner_w
    for si in range(-(-len(values) // shard_w)):
        index = np.full((n_inner, 2), 2**64 - 1, dtype="<u8")
        blobs, pos = [], 0
        idx_size = 16 * n_inner + 4
        base = idx_size if index_location == "start" else 0
        for j in range(n_inner):
            lo = si * shard_w + j * inner_w
            if lo >= len(values) or (drop_inner and (si, j) in drop_inner):
                continue
            arr = values[lo : lo + inner_w]
            if len(arr) < inner_w:  # stored inner chunks are full width
                arr = np.concatenate([arr, np.zeros(inner_w - len(arr))])
            blob = gzip.compress(arr.astype("<f8").tobytes(), 5)
            index[j] = (base + pos, len(blob))
            blobs.append(blob)
            pos += len(blob)
        idx = index.tobytes()
        idx += crc32c(idx).to_bytes(4, "little")
        body = b"".join(blobs)
        shard = idx + body if index_location == "start" else body + idx
        with open(os.path.join(adir, "c", str(si)), "wb") as f:
            f.write(shard)


@pytest.mark.parametrize("index_location", ["end", "start"])
def test_hand_built_shard_decodes(tmp_path, index_location):
    values = np.arange(1000, dtype="f8") * 0.5
    adir = str(tmp_path / "a")
    _write_hand_shard(adir, values, shard_w=256, inner_w=64,
                      index_location=index_location)
    meta, _ = read_zarr_meta(adir)
    assert meta["v3_shard"]["inner"] == 64
    got = read_zarr_array(adir)
    np.testing.assert_array_equal(got, values)


def test_missing_inner_chunk_fills(tmp_path):
    values = np.arange(512, dtype="f8")
    adir = str(tmp_path / "a")
    _write_hand_shard(adir, values, shard_w=256, inner_w=64,
                      drop_inner={(0, 1)})
    got = read_zarr_array(adir)
    np.testing.assert_array_equal(got[64:128], np.full(64, -1.0))
    np.testing.assert_array_equal(got[:64], values[:64])
    np.testing.assert_array_equal(got[128:], values[128:])


def test_corrupt_shard_index_raises(tmp_path):
    values = np.arange(256, dtype="f8")
    adir = str(tmp_path / "a")
    _write_hand_shard(adir, values, shard_w=256, inner_w=64)
    p = os.path.join(adir, "c", "0")
    raw = bytearray(open(p, "rb").read())
    raw[-2] ^= 0xFF  # flip a bit inside the index crc region
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc32c"):
        read_zarr_array(adir)


def test_sharded_write_roundtrip_spark(spark, tmp_path):
    """Engine sink with shards=3: stored objects are real ZEP-2 shards
    (grid-complete index + crc32c at the end), read back exactly through
    the generic Spark scan — including a tail shard with missing inner
    chunks and a vlen-utf8 string column."""
    from pyspark.sql import functions as F

    df = spark.range(2500).select(
        F.col("id").alias("i"),
        (F.col("id") % 13 * 0.25).alias("v"),
        F.timestamp_seconds(F.col("id") * 60 + 1700000000).alias("time"),
        F.concat(F.lit("s_"), (F.col("id") % 7).cast("string")).alias("s"),
    )
    path = str(tmp_path / "sharded.zarr")
    ZarrDatasetWriter(chunk_rows=256, order_by=["i"], zarr_format=3,
                      shards=3, dim="i").write(df, path)

    meta, _ = read_zarr_meta(os.path.join(path, "v"))
    assert meta["chunks"] == [768] and meta["v3_shard"]["inner"] == 256
    # 2500 rows / 768-wide shards -> 4 stored objects, no per-chunk files
    assert sorted(os.listdir(os.path.join(path, "v", "c"))) == ["0", "1", "2", "3"]
    # tail shard holds ceil((2500-3*768)/256)=1 inner chunk; grid index
    # still has 3 entries, 2 of them missing
    raw = open(os.path.join(path, "v", "c", "3"), "rb").read()
    idx = np.frombuffer(raw[-(16 * 3 + 4):-4], dtype="<u8").reshape(3, 2)
    assert (idx[1:] == 2**64 - 1).all() and idx[0, 0] == 0

    back = ZarrReader(dim="i").read(spark, path).orderBy("i").collect()
    assert len(back) == 2500
    assert back[2499]["v"] == 2499 % 13 * 0.25
    assert back[1000]["s"] == f"s_{1000 % 7}"
    assert back[42]["time"] == dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=42 * 60 + 1700000000)


def test_shards_requires_v3():
    with pytest.raises(ValueError, match="shards"):
        ZarrDatasetWriter(zarr_format=2, shards=2)
