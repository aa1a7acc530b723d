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
    from pyspark.sql import Window as W

    from tsdat_spark.queries import rank_value_at

    t = Q.transcripts(spark, sf_dir)
    tier = rollup_tier(t, "1m", series_keys=["conv_id", "role"], salt=4)

    # Exact bracket bounds via the rank-window formulation (no per-group
    # sort_array(collect_list) array — same one-shuffle shape as _rollup):
    # flag the rows at the clamped 0-based ranks r−1 and r+2 around
    # r = ⌊(n−1)·q⌋ and extract them with max(when(...)).
    keys = ["conv_id", "role", "bin_start"]
    tb = t.withColumn("bin_start", F.date_trunc("minute", "ts"))
    wk = W.partitionBy(*keys)
    rk = F.row_number().over(wk.orderBy(F.col("latency_us").asc_nulls_last()))
    n = F.count("latency_us").over(wk)

    def tgt(q: float, off: int):
        # 1-based rank of the 0-based index clamp(⌊(n−1)·q⌋ + off, 0, n−1)
        r = F.floor((n - 1) * F.lit(q)) + F.lit(off)
        return F.greatest(F.least(r, n - 1), F.lit(0)) + 1

    flagged = tb.select(
        *keys, "latency_us",
        rank_value_at(rk, tgt(0.5, -1)).alias("lo50_v"),
        rank_value_at(rk, tgt(0.5, 2)).alias("hi50_v"),
        rank_value_at(rk, tgt(0.95, -1)).alias("lo95_v"),
        rank_value_at(rk, tgt(0.95, 2)).alias("hi95_v"),
    )
    exact = flagged.groupBy(*keys).agg(
        F.max("lo50_v").alias("lo50"), F.max("hi50_v").alias("hi50"),
        F.max("lo95_v").alias("lo95"), F.max("hi95_v").alias("hi95"),
    )

    def bracket_ok(p_col: str, lo: str, hi: str):
        return F.when(F.col("n_latency") == 0, F.lit(True)).otherwise(
            (F.col(p_col) >= F.col(lo)) & (F.col(p_col) <= F.col(hi))
        )

    joined = tier.join(exact, keys)
    return joined.select(
        "conv_id", "role", "bin_start", "n_turns", "token_len_sum", "n_latency",
        bracket_ok("latency_p50", "lo50", "hi50").alias("p50_in_bracket"),
        bracket_ok("latency_p95", "lo95", "hi95").alias("p95_in_bracket"),
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
        "token_count_bpe": Q.q_token_count_bpe,
        "text_quality": Q.q_text_quality,
        "lang_id": Q.q_lang_id,
        "repetition_signals": Q.q_repetition_signals,
        "pii_scrub": Q.q_pii_scrub,
        "line_dedup": Q.q_line_dedup,
        "pack_sequences": Q.q_pack_sequences,
        "bpe_train": Q.q_bpe_train,
        "minhash_signatures": Q.q_minhash_signatures,
        "lsh_pairs": Q.q_lsh_pairs,
        "simhash16": Q.q_simhash16,
        "jaccard_pairs": Q.q_jaccard_pairs,
        "m4_downsample": Q.q_m4_downsample,
        "dedup_clusters": Q.q_dedup_clusters,
        "dedup_clusters_contraction": Q.q_dedup_clusters_contraction,
        "clean_corpus": Q.q_clean_corpus,
        "fingerprint_winnow": Q.q_fingerprint_winnow,
        "contamination_overlap": Q.q_contamination_overlap,
        "knn_cosine": Q.q_knn_cosine,
        "embedding_top1": Q.q_embedding_top1,
        "ann_lsh": Q.q_ann_lsh,
        "ann_lsh_multi": Q.q_ann_lsh_multi,
        "tier_1m_tdigest": _tier_1m_tdigest,
        "neardup_cosine": Q.q_neardup_cosine,
        "ivf_assign": Q.q_ivf_assign,
        "ivf_search": Q.q_ivf_search,
        "sample_stratified": Q.q_sample_stratified,
        "top_tokens": Q.q_top_tokens,
        "lm_perplexity": Q.q_lm_perplexity,
        "distinct_tier_hll": Q.q_distinct_tier_hll,
        "substring_dedup": Q.q_substring_dedup,
        "substring_scrub": Q.q_substring_scrub,
        "bloom_dedup": Q.q_bloom_dedup,
        "tfidf_top_terms": Q.q_tfidf_top_terms,
        "dsir_weights": Q.q_dsir_weights,
        "bm25_top_terms": Q.q_bm25_top_terms,
        "knn_classify": Q.q_knn_classify,
        "normalize_text": Q.q_normalize_text,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
