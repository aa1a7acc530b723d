"""Gorilla codec: round-trip exactness, compression ratio, Spark cold-store
plumbing round-trip."""

import numpy as np
import pytest

from tsdat_spark.compress.gorilla import gorilla_decode, gorilla_encode


def _roundtrip(ts, vals):
    blob = gorilla_encode(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, v2 = gorilla_decode(blob)
    assert np.array_equal(ts2, np.asarray(ts, np.int64))
    assert np.array_equal(v2, np.asarray(vals, np.float64), equal_nan=True)
    return blob


def test_roundtrip_regular():
    n = 5000
    ts = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 20_000_000
    vals = np.round(np.sin(np.arange(n) / 50.0) * 100, 2)
    blob = _roundtrip(ts, vals)
    raw = 16 * n
    assert len(blob) < raw * 0.7  # compresses


def test_roundtrip_identical_values_compress_hard():
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.full(n, 42.125)
    blob = _roundtrip(ts, vals)
    # constant series with constant cadence ≈ 2 bits/point
    assert len(blob) < n  # ≪ 16 bytes/point


def test_roundtrip_adversarial():
    rng = np.random.RandomState(42)
    n = 3000
    # irregular gaps incl. huge jumps, negative dods
    deltas = rng.choice([1, 999, 20_000_000, 86_400_000_000, 7], size=n - 1)
    ts = np.concatenate([[12345], 12345 + np.cumsum(deltas)]).astype(np.int64)
    vals = rng.randn(n) * 1e12
    vals[rng.rand(n) < 0.05] = np.nan
    vals[rng.rand(n) < 0.05] = 0.0
    vals[0] = np.nan
    _roundtrip(ts, vals)


def test_edge_cases():
    _roundtrip([], [])
    _roundtrip([5], [1.5])
    _roundtrip([5, 6], [1.5, np.nan])
    _roundtrip([0, 1, 2], [np.inf, -np.inf, 0.0])
    # non-monotonic dod (out-of-order not required, but negative dod is)
    _roundtrip([0, 100, 110, 300], [1.0, 1.0, 2.0, 1.0])


def test_spark_coldstore_roundtrip(spark):
    from pyspark.sql import functions as F

    from tsdat_spark.io.coldstore import decode_cold_blocks, encode_cold_blocks
    from tsdat_spark.standardize import with_turn_latency
    from tsdat_spark.synth import SynthSpec, generate_transcripts

    df = generate_transcripts(spark, SynthSpec(n_convs=10, base_turns=60, n_mega=1, mega_turns=300))
    df = df.withColumn("value", F.col("turn_idx").cast("double") * 1.5)
    blocks = encode_cold_blocks(df, ["conv_id"], "ts", "value")
    back = decode_cold_blocks(blocks, ["conv_id"], "ts", "value")

    src = df.groupBy("conv_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s"),
        F.min("ts").alias("lo"), F.max("ts").alias("hi"),
    )
    dec = back.groupBy("conv_id").agg(
        F.count("*").alias("n2"), F.sum("value").alias("s2"),
        F.min("ts").alias("lo2"), F.max("ts").alias("hi2"),
    )
    j = src.join(dec, "conv_id", "full").collect()
    assert len(j) == 10
    for r in j:
        assert r["n"] == r["n2"], r
        assert r["s"] == pytest.approx(r["s2"]), r
        assert r["lo"] == r["lo2"] and r["hi"] == r["hi2"], r

    # compression: blocks much smaller than raw 16B/point
    stats = blocks.select(F.sum("n_points").alias("np"), F.sum(F.length("block")).alias("nb")).first()
    assert stats["nb"] < stats["np"] * 16
