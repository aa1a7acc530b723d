"""Retention-tier rollups: 1m / 1h / 1d continuous aggregates.

The engine's headline pipeline (BASELINE.json north rule): per
(conv_id, tool, role) series, every tier row carries

    n_turns, token_len_sum, n_latency, latency_p50/p95, latency_tdigest

where the t-digest is a *mergeable* binary sketch, so coarser tiers are
computed by RE-AGGREGATING the finer tier (merge digests, add counts) —
never by re-reading raw turns. This is the continuous-aggregate design of
TimescaleDB/Druid-style rollup stores re-expressed on Spark.

Two-phase skew-safe plan (tsdat has no notion of this; mandatory at 10^12
turns):

  phase 1 — **map-side partial aggregation, zero shuffle**: one
     ``mapInPandas`` pass over the natural input partitions; a pandas
     groupby inside each Arrow batch emits one partial row
     (count, sum, digest) per (series, bin) seen in that batch. A
     mega-conversation is spread across many input partitions, so no task
     ever holds a whole hot key — the partition index acts as the salt
     (the generalized form of salted two-phase rollup; an explicit
     ``salt`` column would only re-shuffle raw rows to achieve the same
     partial independence this gets for free).
  phase 2 — **merge, one small shuffle**: partials (≈ one row per
     (series, bin) per upstream batch — orders of magnitude smaller than
     the raw data) groupBy (series, bin) and merge: counts add, digests
     merge associatively.

Plain counts/sums are algebraic and Spark's hash aggregate would combine
them map-side anyway; the pandas phases exist for the digest, which Spark
has no built-in mergeable equivalent for (percentile_approx is not
re-aggregable across tiers).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tdigest import TDigest, fast_bytes_from_sorted, fast_merge_bytes

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def _group_slices(pdf: pd.DataFrame, keys: list[str]):
    """Sort so equal keys are adjacent; return (sorted pdf, group start
    idx, group end idx).

    Round 7: keys are factorized to int codes and ordered with one
    ``np.lexsort`` — grouping only needs equal keys adjacent, not
    lexicographic order, and an int lexsort beats ``sort_values`` over
    object (string) columns by ~5-10x at tier-partition sizes. Nulls/NaT
    factorize to one shared -1 code, preserving the old null==null
    grouping. Boundaries come from the codes (factorize is exact), not a
    per-column value compare."""
    n = len(pdf)
    codes = [pd.factorize(pdf[k], use_na_sentinel=True)[0] for k in keys]
    order = np.lexsort(tuple(reversed(codes)))
    pdf = pdf.iloc[order].reset_index(drop=True)
    change = np.zeros(n - 1, dtype=bool)
    for c in codes:
        cs = c[order]
        change |= cs[1:] != cs[:-1]
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    return pdf, starts, ends

_PARTIAL_FIELDS = (
    "n_turns long, token_len_sum long, n_latency long, latency_tdigest binary"
)
_FINAL_FIELDS = (
    "n_turns long, token_len_sum long, n_latency long, "
    "latency_p50 double, latency_p95 double, latency_tdigest binary"
)


def _tier_window(ts_col: str, tier: str):
    secs = TIER_SECONDS[tier]
    return F.timestamp_seconds((F.unix_micros(F.col(ts_col)) / 1_000_000 / secs).cast("long") * secs)


def _key_schema(df: DataFrame, keys: list[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{k} {by_name[k]}" for k in keys)


def _digest_of_group(lat: np.ndarray, compression: float) -> bytes:
    return TDigest.from_values(lat, compression).to_bytes()


def _merge_partials(partial: DataFrame, keys: list[str], final_schema: str, compression: float) -> DataFrame:
    """Phase 2: hash-repartition partial rows on the group keys, then merge
    each partition in ONE Python call (pd.concat + groupby) — one output
    row per (series, bin), never a per-group Python invocation. Partial
    rows are tiny (one per group per upstream batch), so whole-partition
    concat is safe."""

    def merge_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if not b.empty]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf, starts, ends = _group_slices(pdf, keys)
        blobs_in = pdf["latency_tdigest"].to_numpy()
        out = pdf.iloc[starts][keys].reset_index(drop=True)
        out["n_turns"] = np.add.reduceat(pdf["n_turns"].to_numpy(np.int64), starts)
        out["token_len_sum"] = np.add.reduceat(pdf["token_len_sum"].to_numpy(np.int64), starts)
        out["n_latency"] = np.add.reduceat(pdf["n_latency"].to_numpy(np.int64), starts)
        p50, p95, blobs = [], [], []
        for s, e in zip(starts, ends):
            blob, (q50, q95) = fast_merge_bytes(blobs_in[s:e], compression)
            p50.append(q50)
            p95.append(q95)
            blobs.append(blob)
        out["latency_p50"] = p50
        out["latency_p95"] = p95
        out["latency_tdigest"] = blobs
        yield out[[*keys, "n_turns", "token_len_sum", "n_latency",
                   "latency_p50", "latency_p95", "latency_tdigest"]]

    # Explicit partition count (= session shuffle partitions): repartition
    # by columns alone is AQE-coalescible toward 64 MB targets, which
    # serializes this Python-heavy merge stage onto a handful of cores at
    # small-to-medium tier sizes. Partials have no residual skew (hot keys
    # were already collapsed per upstream batch), so fixed-width hash
    # partitioning is safe.
    n_shuffle = int(partial.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return partial.repartition(n_shuffle, *keys).mapInPandas(merge_partition, final_schema)


def rollup_tier(
    df: DataFrame,
    tier: str,
    series_keys: list[str] = ("conv_id", "tool", "role"),
    ts_col: str = "ts",
    token_col: str = "token_len",
    latency_col: str = "latency_us",
    salt: int = 0,  # kept for API compat; native partial agg makes it moot
    compression: float = 100.0,
) -> DataFrame:
    """Raw turns → one tier.

    Round-7 shape (guide §2.3 "aggregate before you shuffle" + §4.1):
    counts/sums/sorted-latency-lists are ONE native Spark aggregation
    (map-side partial agg in the JVM — the raw 7M-row Arrow round trip of
    the old pandas phase 1 disappears), and a single mapInPandas finish
    stage builds the digest blob + quantiles per group with the batch-
    vectorized helper (``tdigest.batch_digests_from_sorted``). Plan: scan →
    hash-aggregate (partial) → exchange on the group keys → hash-aggregate
    (final) → one Python stage over group-grain rows. Was: scan → Arrow →
    pandas phase 1 → exchange → Arrow → pandas phase 2.

    Digest parity: ``sort_array(collect_list)`` delivers each group's
    non-null latencies sorted, so unit-weight blobs (every group at fine
    tier grain, n <= 4·compression) are byte-identical to the old
    two-phase merge; oversized groups are now digested from ALL their
    values directly — at least as accurate as merging per-batch partials
    (the bracket invariants pytest asserts are unchanged).

    Scale note: the exchange carries each latency value once (8 B), vs the
    old per-(group, upstream-batch) partial blobs — equivalent at fine
    grain where groups are near-singletons. Coarse tiers over mega-series
    should be produced by ``reaggregate_tier`` from a finer tier (the
    engine's documented cascade), which still merges bounded partials.
    """
    series_keys = list(series_keys)
    secs = TIER_SECONDS[tier]
    binned = df.select(
        *series_keys,
        _tier_window(ts_col, tier).alias("bin_start"),
        F.col(token_col).alias("__tok"),
        F.col(latency_col).cast("double").alias("__lat"),
    )

    keys = [*series_keys, "bin_start"]
    key_schema = _key_schema(binned, series_keys)
    final_schema = f"{key_schema}, bin_start timestamp, {_FINAL_FIELDS}"

    agg = binned.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(F.sum("__tok"), F.lit(0)).cast("long").alias("token_len_sum"),
        F.count("__lat").alias("n_latency"),
        F.sort_array(F.collect_list("__lat")).alias("__lats"),
    )

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .tdigest import batch_digests_from_sorted

        for pdf in batches:
            if pdf.empty:
                continue
            arrs = [np.asarray(a, dtype=np.float64) for a in pdf["__lats"]]
            blobs, (p50, p95) = batch_digests_from_sorted(arrs, compression)
            out = pdf[[*keys, "n_turns", "token_len_sum", "n_latency"]].copy()
            out["latency_p50"] = p50
            out["latency_p95"] = p95
            out["latency_tdigest"] = blobs
            yield out

    out = agg.mapInPandas(finish, final_schema)
    return out.withColumn("bin_end", F.col("bin_start") + F.expr(f"INTERVAL {secs} SECOND"))


def reaggregate_tier(
    tier_df: DataFrame,
    to_tier: str,
    series_keys: list[str] = ("conv_id", "tool", "role"),
    compression: float = 100.0,
) -> DataFrame:
    """Finer tier → coarser tier by merging (counts add, digests merge).

    Verifiable invariant (tested): re-aggregation equals the direct rollup
    of the raw data up to t-digest sketch error; counts/sums are exact.

    Round-7 shape (guide §2.3): counts/sums and blob collection are ONE
    native Spark aggregation (JVM partial agg, no fine-tier-grain Arrow
    round trip); the Python stage then merges each group's blob list at
    COARSE-group grain — ~input/output-ratio fewer rows cross the Python
    boundary than the old repartition→concat→sort→merge pandas pass.
    """
    series_keys = list(series_keys)
    secs = TIER_SECONDS[to_tier]
    df = tier_df.withColumn("bin_start", _tier_window("bin_start", to_tier))
    keys = [*series_keys, "bin_start"]

    key_schema = _key_schema(df, series_keys)
    final_schema = f"{key_schema}, bin_start timestamp, {_FINAL_FIELDS}"

    agg = df.groupBy(*keys).agg(
        F.sum("n_turns").alias("n_turns"),
        F.sum("token_len_sum").alias("token_len_sum"),
        F.sum("n_latency").alias("n_latency"),
        F.collect_list("latency_tdigest").alias("__blobs"),
    )

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .tdigest import batch_merge_blob_lists

        for pdf in batches:
            if pdf.empty:
                continue
            # batch merge (round 7): groups whose total value count is
            # within the unit-weight limit ride the vectorized
            # sorted-values path; the rest fall back to per-group
            # fast_merge_bytes inside the helper — byte-identical either
            # way (see batch_merge_blob_lists)
            blobs, (p50s, p95s) = batch_merge_blob_lists(
                list(pdf["__blobs"]), pdf["n_latency"].to_numpy(), compression
            )
            out = pdf[[*keys, "n_turns", "token_len_sum", "n_latency"]].copy()
            out["latency_p50"] = p50s
            out["latency_p95"] = p95s
            out["latency_tdigest"] = blobs
            yield out

    out = agg.mapInPandas(finish, final_schema)
    return out.withColumn("bin_end", F.col("bin_start") + F.expr(f"INTERVAL {secs} SECOND"))


def tier_summary(
    tier_df: DataFrame,
    by: list[str] = ("tool", "role"),
    conv_col: str = "conv_id",
) -> DataFrame:
    """Cross-conversation summary at (by..., bin_start) grain.

    ``n_distinct_convs`` is EXACT here: the finer tier still carries
    conv_id, so distinct-count happens at this rollup grain rather than by
    (impossible) merging of per-conv distinct counts — the tier-boundary
    semantics SURVEY §7.4 pins down. Spark plans countDistinct as a
    two-phase expand + partial agg (skew-safe).
    """
    return tier_df.groupBy(*by, "bin_start").agg(
        F.sum("n_turns").alias("n_turns"),
        F.countDistinct(F.col(conv_col)).alias("n_distinct_convs"),
        F.sum("token_len_sum").alias("token_len_sum"),
        F.sum("n_latency").alias("n_latency"),
    )
