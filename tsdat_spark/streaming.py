"""Structured Streaming tier maintenance — continuous aggregates on a stream.

tsdat is batch-only (eager xarray, one file at a time); the Spark-native way
to keep the 1m/1h/1d retention tiers fresh against a continuously-landing
transcript stream is:

1. **Append mergeable partials** (:func:`stream_append_tier`): a
   ``foreachBatch`` sink runs the SAME two-phase ``rollup_tier`` program on
   each micro-batch and APPENDS the resulting tier rows. Because every tier
   row is a mergeable partial (counts add, t-digests merge — see
   ``rollup/tdigest.py``), a tier table with duplicate (series, bin) keys is
   a valid "unmerged" state; readers and the compactor collapse duplicates
   with :func:`tsdat_spark.rollup.reaggregate_tier` at the SAME grain, which
   is associative and therefore exactly-once-insensitive to micro-batch
   boundaries. Checkpointing is Spark's own streaming checkpoint (source
   offsets), composing with the per-partition lineage manifests of the
   batch path.
2. **Watermarked windowed aggregate** (:func:`stream_windowed_counts`): the
   pure-streaming formulation for the exact columns (counts/sums/distinct),
   with late data bounded by the watermark — use when no sketch columns are
   needed and end-to-end latency matters.

Scale notes: foreachBatch reuses the batch engine, so skew handling and the
zero-shuffle phase-1 partials apply per micro-batch; the windowed aggregate
keeps state per (series, bin), which the watermark bounds to
``watermark / tier_width`` windows per series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import reaggregate_tier, rollup_tier
from .rollup.tiers import TIER_SECONDS


def stream_append_tier(
    spark: SparkSession,
    source_path: str,
    source_schema: str,
    tier_path: str,
    checkpoint_path: str,
    tier: str = "1m",
    series_keys: list[str] = ("conv_id", "tool", "role"),
    ts_col: str = "ts",
    available_now: bool = True,
):
    """Start (and with ``available_now`` run to completion) a streaming query
    that appends per-micro-batch tier partials (see module docstring).

    Returns the StreamingQuery; callers own ``awaitTermination``.
    """
    stream = spark.readStream.schema(source_schema).parquet(source_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tier_rows = rollup_tier(batch_df, tier, series_keys=list(series_keys), ts_col=ts_col)
        (
            tier_rows.withColumn("p_date", F.to_date(F.col("bin_start")))
            .write.partitionBy("p_date")
            .mode("append")
            .parquet(tier_path)
        )

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_tier(
    spark: SparkSession,
    tier_path: str,
    tier: str,
    series_keys: list[str] = ("conv_id", "tool", "role"),
) -> DataFrame:
    """Collapse duplicate (series, bin) partials by re-aggregating the tier
    at its OWN grain (merge is associative; same operator as the tier
    cascade). Returns the compacted frame; callers decide whether to
    rewrite the table or just read through it."""
    df = spark.read.parquet(tier_path)
    return reaggregate_tier(df, tier, series_keys=list(series_keys))


def stream_windowed_counts(
    stream_df: DataFrame,
    tier: str = "1m",
    series_keys: list[str] = ("conv_id", "role"),
    ts_col: str = "ts",
    token_col: str = "token_len",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregate of the exact tier columns
    (n_turns / token_len_sum / n_latency) — the pure-streaming tier path."""
    secs = TIER_SECONDS[tier]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{secs} seconds").alias("w"), *series_keys)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(token_col).alias("token_len_sum"),
            F.count("latency_us").alias("n_latency"),
        )
        .select(F.col("w.start").alias("bin_start"), *series_keys,
                "n_turns", "token_len_sum", "n_latency")
    )
