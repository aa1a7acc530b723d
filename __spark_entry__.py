"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship pipeline on sf0.001: derive transcripts →
  standardize-order → QC → engine 1m tier rollup (salted two-phase +
  t-digest sketches).
- ``queries()`` — one entry per implemented operator (SURVEY.md §2 and the
  training-data ops), each (spark, sf_dir) -> DataFrame.
- ``oracle_sql()`` — DuckDB-equivalent SQL per oracle-checkable query.
  Queries without an oracle entry (engine-native sketch/compression paths)
  get the driver's rows-only check and are additionally covered by pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdat_spark import queries as Q
from tsdat_spark.oracles import ORACLES
from tsdat_spark.rollup import rollup_tier


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = Q.transcripts(spark, "/root/testdata/sf0.001")
    tier = rollup_tier(
        t, "1m", series_keys=["conv_id", "role"], ts_col="ts",
        token_col="token_len", latency_col="latency_us", salt=4,
    )
    return tier.select(
        "conv_id", "role", "bin_start", "bin_end",
        "n_turns", "token_len_sum", "n_latency", "latency_p50", "latency_p95",
    )


def _tier_1m_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native 1m tier (t-digest path), fully oracle-checked.

    Counts/sums are exact and compared exactly. The t-digest percentiles are
    approximate by design, so they are checked as *bracket booleans*: the
    digest p50/p95 must fall within the sorted-values bracket
    [rank floor((n-1)q) - 1, rank floor((n-1)q) + 2] (±1 rank slack around
    the adjacent-rank discrete quantiles). With unit-weight (singleton)
    centroids — guaranteed at 1m grain, where groups are far below the
    4·compression=400 threshold in tdigest.fast_bytes_from_sorted — the
    digest interpolates between adjacent sorted values at rank q·n−0.5,
    which is provably inside this bracket. The oracle emits literal TRUE,
    so any digest regression flips the value hash red.
    """
    t = Q.transcripts(spark, sf_dir)
    tier = rollup_tier(t, "1m", series_keys=["conv_id", "role"], salt=4)
    exact = (
        t.groupBy("conv_id", "role", F.date_trunc("minute", "ts").alias("bin_start"))
        .agg(F.sort_array(F.collect_list("latency_us")).alias("lat"))
    )

    def bracket_ok(p_col: str, q: float):
        # try_element_at + index clamps: ANSI mode (Spark 4 default) makes
        # element_at throw on 0/out-of-range, and when n==0 both branch
        # expressions are still evaluated.
        n = F.size("lat")
        r = F.floor((n - 1) * F.lit(q)).cast("int")
        lo = F.try_element_at("lat", F.greatest(r - 1, F.lit(0)) + 1)
        hi = F.try_element_at("lat", F.greatest(F.least(r + 2, n - 1) + 1, F.lit(1)))
        return F.when(n == 0, F.lit(True)).otherwise(
            (F.col(p_col) >= lo) & (F.col(p_col) <= hi)
        )

    joined = tier.join(exact, ["conv_id", "role", "bin_start"])
    return joined.select(
        "conv_id", "role", "bin_start", "n_turns", "token_len_sum", "n_latency",
        bracket_ok("latency_p50", 0.5).alias("p50_in_bracket"),
        bracket_ok("latency_p95", 0.95).alias("p95_in_bracket"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "standardize_transcripts": Q.q_standardize,
        "standardize_csv": Q.q_standardize_csv,
        "rollup_1m": Q.q_rollup_1m,
        "rollup_1h": Q.q_rollup_1h,
        "rollup_1d": Q.q_rollup_1d,
        "tier_summary_1h": Q.q_tier_summary_1h,
        "qc_missing_text": Q.q_qc_missing_text,
        "qc_monotonic_value": Q.q_qc_monotonic_value,
        "qc_delta_value": Q.q_qc_delta_value,
        "qc_range_value": Q.q_qc_range_value,
        "qc_std_value": Q.q_qc_std_value,
        "qc_mask_threshold": Q.q_qc_mask_threshold,
        "gap_fill_1h": Q.q_gap_fill_1h,
        "unit_convert": Q.q_unit_convert,
        "sessionize": Q.q_sessionize,
        "bin_average_30m": Q.q_bin_average_30m,
        "nearest_1h": Q.q_nearest_1h,
        "interpolate_1h": Q.q_interpolate_1h,
        "dedup_exact": Q.q_dedup_exact,
        "token_count": Q.q_token_count,
        "text_quality": Q.q_text_quality,
        "lang_id": Q.q_lang_id,
        "minhash_signatures": Q.q_minhash_signatures,
        "lsh_pairs": Q.q_lsh_pairs,
        "simhash16": Q.q_simhash16,
        "jaccard_pairs": Q.q_jaccard_pairs,
        "fingerprint_winnow": Q.q_fingerprint_winnow,
        "knn_cosine": Q.q_knn_cosine,
        "embedding_top1": Q.q_embedding_top1,
        "ann_lsh": Q.q_ann_lsh,
        "tier_1m_tdigest": _tier_1m_tdigest,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
