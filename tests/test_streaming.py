"""Structured Streaming tier maintenance: micro-batch partial appends +
compaction must equal the batch rollup of the same data; the watermarked
windowed aggregate must produce the exact tier counts."""

import pytest
from pyspark.sql import functions as F

from tsdat_spark.rollup import rollup_tier
from tsdat_spark.standardize import with_token_len, with_turn_latency
from tsdat_spark.streaming import compact_tier, stream_append_tier, stream_windowed_counts
from tsdat_spark.synth import SynthSpec, generate_transcripts

KEYS = ["conv_id", "role"]


@pytest.fixture(scope="module")
def turns(spark):
    df = with_turn_latency(with_token_len(generate_transcripts(
        spark, SynthSpec(n_convs=12, base_turns=60, n_mega=1, mega_turns=300))))
    df.persist(); df.count()
    yield df
    df.unpersist()


def _tier_key(r):
    return (r["conv_id"], r["role"], r["bin_start"])


def test_stream_append_plus_compaction_equals_batch(spark, turns, tmp_path):
    src = str(tmp_path / "src")
    tier_path = str(tmp_path / "tier_1m")
    ckpt = str(tmp_path / "ckpt")

    # land the input as TWO separate file drops (micro-batch boundaries land
    # mid-conversation, so cross-batch merge is actually exercised)
    a, b = turns.randomSplit([0.5, 0.5], seed=7)
    a.write.mode("overwrite").parquet(src)
    schema = turns.schema.simpleString()[7:-1].replace(":", " ").replace(",", ", ")

    q = stream_append_tier(spark, src, schema, tier_path, ckpt, "1m", KEYS)
    q.awaitTermination(120)
    b.write.mode("append").parquet(src)
    q2 = stream_append_tier(spark, src, schema, tier_path, ckpt, "1m", KEYS)
    q2.awaitTermination(120)

    compacted = compact_tier(spark, tier_path, "1m", KEYS)
    batch = rollup_tier(turns, "1m", series_keys=KEYS)

    got = {_tier_key(r): r for r in compacted.collect()}
    exp = {_tier_key(r): r for r in batch.collect()}
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        g = got[k]
        assert g["n_turns"] == e["n_turns"]
        assert g["token_len_sum"] == e["token_len_sum"]
        assert g["n_latency"] == e["n_latency"]
        # digests merged across micro-batch boundaries: quantiles within
        # sketch tolerance of the single-pass batch digest
        if e["n_latency"] > 0:
            assert g["latency_p50"] == pytest.approx(e["latency_p50"], rel=0.1, abs=1e-6)


def test_windowed_counts_matches_batch(spark, turns, tmp_path):
    src = str(tmp_path / "wsrc")
    turns.write.mode("overwrite").parquet(src)
    schema = turns.schema.simpleString()[7:-1].replace(":", " ").replace(",", ", ")
    stream = spark.readStream.schema(schema).parquet(src)
    agg = stream_windowed_counts(stream, "1m", KEYS)
    q = (
        agg.writeStream.format("memory").queryName("win_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {_tier_key(r): r for r in spark.sql("select * from win_counts").collect()}

    exp_df = turns.groupBy(F.date_trunc("minute", "ts").alias("bin_start"), *KEYS).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("token_len").alias("token_len_sum"),
        F.count("latency_us").alias("n_latency"),
    )
    exp = {_tier_key(r): r for r in exp_df.collect()}
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        assert got[k]["n_turns"] == e["n_turns"]
        assert (got[k]["token_len_sum"] or 0) == (e["token_len_sum"] or 0)
