"""Corpus-level exact line deduplication (C4 / RefinedWeb style).

C4 (Raffel et al. 2020, §2.2) and RefinedWeb (Penedo et al. 2023) drop
duplicated lines ACROSS the whole corpus, not just within a document —
boilerplate (nav bars, cookie banners, license footers) repeats across
millions of pages. The rule implemented here: a line occurring more than
once corpus-wide keeps only its first occurrence under the stable global
order ``(doc_id, line_idx)``; every later occurrence is dropped, and each
document's surviving lines are re-joined in order.

Spark shape (all equi-key, no skew-prone keys):
1. explode documents into (doc_id, line_idx, line) — linear;
2. groupBy ``xxhash64(line)`` → ``min(struct(doc_id, line_idx))`` — one
   shuffle keyed by a 64-bit hash (uniform by construction, map-side
   partial agg collapses duplicates before the exchange);
3. join lines back on the hash (same key → same partitioning, AQE can
   reuse the exchange) and keep rows equal to the group's minimum;
4. groupBy doc_id → ``array_join(array_sort(collect_list(struct(...))))``
   to reassemble — per-document arrays are bounded by document size, never
   by corpus size.

At 100 TB every stage is a linear scan plus hash-partitioned exchanges on
unskewed keys; nothing ever materializes a whole corpus' lines in one
task. (A 64-bit hash collision would merge two distinct lines; at 10^12
lines the birthday bound is ~2.7% for ANY collision corpus-wide — pipelines
wanting zero risk can group on the line itself at higher shuffle cost via
``join_on_hash=False``.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_lines(text: Column, sep: str = "\n") -> Column:
    """Non-empty lines of ``text`` (order-preserving)."""
    return F.filter(F.split(text, sep), lambda x: x != "")


def chunk_tokens(text: Column, n: int) -> Column:
    """Fixed-size token chunks as synthetic "lines".

    The driver's synthetic documents are single-line word soup; chunking
    into ``n``-token groups gives the dedup a line structure with real
    corpus-level duplicates. Real corpora use :func:`split_lines`.
    """
    toks = F.filter(F.split(text, " "), lambda x: x != "")
    k = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    # sequence(0, -1) would step BACKWARDS in Spark; empty docs get [].
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
        )
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lines: Column | None = None,
    join_on_hash: bool = True,
) -> DataFrame:
    """Drop all but the first corpus-wide occurrence of each line.

    Returns one row per document: ``(id, n_lines, n_kept, text_clean)``
    with ``text_clean`` the surviving lines joined by a single space.
    Documents whose every line was seen earlier come back with
    ``n_kept = 0`` and an empty ``text_clean`` (the caller decides whether
    to drop empties — C4 does).
    """
    line_arr = lines if lines is not None else split_lines(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("__id"), F.posexplode(line_arr).alias("__idx", "__line")
    )
    key = F.xxhash64("__line") if join_on_hash else F.col("__line")
    # round 7 note: a localCheckpoint barrier here (one explode instead of
    # two) measured NEUTRAL at sf1.0 and would materialize corpus-scale
    # exploded lines at 100 TB — two streaming passes are the better trade
    exploded = exploded.withColumn("__key", key)
    # first occurrence = lexicographic min over (id, idx); min(struct)
    # cannot hash-aggregate (SortAggregate → two full sorts of the
    # exploded line table), so decompose: per-(line, doc) min idx (hash
    # agg, makes (key, id) unique), then per-line min doc + min_by its
    # idx — deterministic because stage one deduplicated the ordering key
    # (same round-7 rewrite as substring_scrub).
    per_doc = exploded.groupBy("__key", "__id").agg(F.min("__idx").alias("__mi"))
    first = per_doc.groupBy("__key").agg(
        F.min("__id").alias("__fid"),
        F.min_by("__mi", "__id").alias("__fidx"),
    )
    kept = (
        exploded.join(first, "__key")
        .withColumn(
            "__keep",
            (F.col("__id") == F.col("__fid")) & (F.col("__idx") == F.col("__fidx")),
        )
    )
    return (
        kept.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"), F.struct("__idx", "__line")
                            )
                        )
                    ),
                    lambda s: s.getField("__line"),
                ),
                " ",
            ).alias("text_clean"),
        )
        .withColumnRenamed("__id", id_col)
    )
