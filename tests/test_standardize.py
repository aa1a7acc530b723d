"""Standardizer: rename/cast/fill/static/dedup semantics + synth generator
invariants (FIXTURES.md F1/F5)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tsdat_spark.config import DatasetSpec, VariableSpec
from tsdat_spark.standardize import standardize, with_token_len, with_turn_latency
from tsdat_spark.synth import SynthSpec, generate_transcripts


def test_ingest_golden_units(spark):
    """FIXTURES.md F5 (reference test_pipeline.py:12-58): rename multi-
    candidate, parse string timestamps, degF→degC, static scalar."""
    raw = spark.createDataFrame(
        [("2022-03-24 21:43:00", 71.4), ("2022-03-24 21:44:00", 71.2), ("2022-03-24 21:45:00", 71.1)],
        "timestamp string, `First Data Var` double",
    )
    spec = DatasetSpec(
        name="ingest",
        ts_col="time",
        variables={
            "first": VariableSpec("first", "double", source_names=["First Data Var", "alt"]),
            "pi": VariableSpec("pi", "double", static_value=3.14159),
        },
    )
    raw = raw.withColumn("time", F.to_timestamp("timestamp", "yyyy-MM-dd HH:mm:ss"))
    out = standardize(raw, spec)
    out = out.withColumn("first", F.round((F.col("first") - 32) * 5 / 9, 5))  # units stage
    rows = out.orderBy("time").collect()
    assert [r["first"] for r in rows] == pytest.approx([21.88889, 21.77778, 21.72222])
    assert all(r["pi"] == 3.14159 for r in rows)
    assert rows[0]["time"] == dt.datetime(2022, 3, 24, 21, 43)


def test_fill_value_to_null_and_missing_columns(spark):
    raw = spark.createDataFrame([(1, -9999.0), (2, 5.0)], "t int, v double")
    spec = DatasetSpec(
        name="x",
        ts_col="ts",
        variables={
            "v": VariableSpec("v", "double", fill_value=-9999.0),
            "w": VariableSpec("w", "double"),  # absent in input → NULL
        },
    )
    raw = raw.withColumn("ts", F.timestamp_seconds(F.col("t")))
    rows = standardize(raw, spec).orderBy("ts").collect()
    assert rows[0]["v"] is None and rows[1]["v"] == 5.0
    assert all(r["w"] is None for r in rows)


def test_dedup_stable_keeps_first_by_ts(spark):
    raw = spark.createDataFrame(
        [("a", 0, "late", 200), ("a", 0, "early", 100), ("a", 1, "x", 300)],
        "conv_id string, turn_idx int, text string, t long",
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")
    spec = DatasetSpec(
        name="tr", ts_col="ts",
        variables={
            "conv_id": VariableSpec("conv_id", "string"),
            "turn_idx": VariableSpec("turn_idx", "int"),
            "text": VariableSpec("text", "string"),
        },
    )
    out = standardize(raw, spec, dedup_keys=["conv_id", "turn_idx"]).orderBy("turn_idx").collect()
    assert len(out) == 2
    assert out[0]["text"] == "early"


def test_synth_deterministic_and_anomalous(spark):
    s = SynthSpec(n_convs=25, base_turns=40, n_mega=1, mega_turns=800)
    a = generate_transcripts(spark, s)
    b = generate_transcripts(spark, SynthSpec(**{**s.__dict__}))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    df = with_turn_latency(with_token_len(a))
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("text") == "").cast("int")).alias("empty"),
        F.sum(F.col("text").isNull().cast("int")).alias("nulls"),
        F.countDistinct("conv_id").alias("convs"),
    ).first()
    assert stats["convs"] == 25
    assert stats["empty"] > 0 and stats["nulls"] > 0

    # mega conv dominates (skew present)
    sizes = df.groupBy("conv_id").count().orderBy(F.desc("count")).collect()
    assert sizes[0]["count"] > 10 * sizes[1]["count"]

    # duplicates present pre-dedup
    dups = df.groupBy("conv_id", "turn_idx").count().where("count > 1").count()
    assert dups > 0

    # out-of-order ts present within convs
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    ooo = df.withColumn("prev", F.lag("ts").over(w)).where(F.col("ts") < F.col("prev")).count()
    assert ooo > 0
