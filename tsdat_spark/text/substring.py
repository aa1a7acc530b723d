"""Substring-level duplicated-span detection (Lee et al. 2022 style).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) removes EXACT SUBSTRINGS that repeat across a corpus, not just
whole duplicate documents — boilerplate paragraphs, license blocks, and
quoted passages recur inside otherwise-unique pages. Their reference
implementation builds a corpus-wide suffix array; that is a single-machine
construction. This module re-expresses the detection phase Spark-first:

1. **Row-wise k-gram hashing under whole-stage codegen.** Explode a
   per-doc position ``sequence(0, n-k)`` and hash each k-token window
   row-wise — ``xxhash64(concat_ws(slice(tokens, pos+1, k)))`` — all
   plain (non-lambda) expressions, linear in tokens
   (:func:`_exploded_grams`; the earlier HOF-array form survives as
   :func:`kgram_hashes` with its measured 3.7× explode penalty named).
2. **Corpus-wide duplicate k-grams.** ``groupBy(hash)`` with a count:
   one exchange keyed by a uniform 64-bit hash, map-side partial
   aggregation collapsing repeats before the wire. A k-gram is
   *duplicated* when its corpus-wide occurrence count is ``>= min_count``
   (2 by default — same criterion Lee et al. use for the
   length-thresholded substrings).
3. **Join back + span merge.** Duplicated positions rejoin the exploded
   k-grams on the same hash key (AQE reuses the exchange or broadcasts the
   duplicate list when small), then per-document consecutive positions
   merge into maximal spans with one window: a new span starts when
   ``pos - lag(pos) > k`` (i.e. the covered token intervals
   ``[pos, pos+k-1]`` neither overlap nor touch). Covered tokens per span
   are exactly ``last - first + k`` because merged spans are gap-free.

Output is one row per document — ``(id, n_tokens, n_dup_kgrams, n_spans,
dup_tokens)`` — all integers, with zero-rows for documents containing no
duplicated k-gram. ``dup_tokens / n_tokens`` is the duplicated-substring
fraction a C4-style filter would threshold on.

At 100 TB: the explode is O(total tokens) rows but every downstream key is
an unskewed 64-bit hash (stop-phrase k-grams concentrate COUNT, not rows —
the count aggregate absorbs them map-side; the join back carries only
hashes with count >= min_count). The per-document window and the two final
aggregates share the ``id`` partitioning, so Spark plans one exchange for
all three. Nothing materializes corpus-scale state in one task.

:func:`substring_scrub` is the matching TRANSFORM: every duplicated
k-gram position that is not the gram's globally-first occurrence (stable
``(doc_id, pos)`` order, same first-wins contract as line_dedup) has its
covered tokens removed, and each document's surviving tokens are re-joined
in order — Lee et al.'s actual dedup step, not just the statistics.

Reference analog: tsdat has no substring dedup; this is part of the
LLM-training-data operator family (cf. text/dedup.py, text/lines.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def kgram_hashes(text: Column, k: int) -> Column:
    """Array of ``xxhash64`` values of the k-token windows of ``text``.

    Whitespace-tokenized; documents shorter than ``k`` tokens yield an
    empty array. Entirely map-side (one ``transform`` over a ``sequence``).

    NOTE: for the explode-then-aggregate path use :func:`_exploded_grams`
    instead — ``posexplode`` of this higher-order-function array re-enters
    interpreted expression evaluation per output row and measured 3.7×
    slower than exploding positions and hashing row-wise under
    whole-stage codegen (5.6 s vs 1.5 s for 256k grams at sf0.1).
    """
    toks = F.filter(F.split(text, " "), lambda x: x != "")
    n = F.size(toks)
    return F.when((text.isNull()) | (n - k < 0), F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        )
    )


def _exploded_grams(df: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """``(__id, __pos, __h)`` — one row per k-gram position, hashed
    ROW-WISE after a position explode so the whole pipeline stays inside
    whole-stage codegen (see :func:`kgram_hashes` note)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n = F.size(toks)
    positions = F.when(
        (F.col(text_col).isNull()) | (n - k < 0),
        F.array().cast("array<int>"),
    ).otherwise(F.sequence(F.lit(0), n - k))
    return df.select(
        F.col(id_col).alias("__id"),
        toks.alias("__t"),
        F.explode(positions).alias("__pos"),
    ).select(
        "__id",
        "__pos",
        F.xxhash64(
            F.concat_ws(" ", F.slice(F.col("__t"), F.col("__pos") + 1, k))
        ).alias("__h"),
    )


def substring_dedup(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-substring statistics.

    Returns ``(id, n_tokens, n_dup_kgrams, n_spans, dup_tokens)`` where
    ``n_dup_kgrams`` counts this document's k-gram positions whose k-gram
    occurs ``>= min_count`` times corpus-wide, ``n_spans`` counts maximal
    merged runs of such positions, and ``dup_tokens`` counts the tokens
    those runs cover.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_tokens = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(F.size(toks))
    base = df.select(
        F.col(id_col).alias("__id"),
        n_tokens.cast("long").alias("n_tokens"),
    )
    # round 7: two consumers (the duplicate-count aggregate and the join
    # back) plus generate-inferred filters otherwise re-run the whole
    # tokenize+slice+hash explode per consumer — materialize it once
    # (sf1.0: 3.8 -> 2.2 s)
    exploded = _exploded_grams(df, k, id_col, text_col).localCheckpoint(eager=False)
    dup = (
        exploded.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("__h")
    )
    dup_pos = exploded.join(dup, "__h").select("__id", "__pos")

    w = Window.partitionBy("__id").orderBy("__pos")
    new_span = F.when(
        F.col("__pos") - F.lag("__pos").over(w) > k, F.lit(1)
    ).otherwise(F.lit(0))
    spans = dup_pos.withColumn(
        "__span",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_span = spans.groupBy("__id", "__span").agg(
        F.count(F.lit(1)).alias("__cnt"),
        (F.max("__pos") - F.min("__pos") + k).alias("__covered"),
    )
    per_doc = per_span.groupBy("__id").agg(
        F.sum("__cnt").alias("n_dup_kgrams"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("__covered").alias("dup_tokens"),
    )
    return (
        base.select("__id", "n_tokens")
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce("n_dup_kgrams", F.lit(0)).cast("long").alias("n_dup_kgrams"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def substring_scrub(
    df: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove all-but-first occurrences of duplicated k-gram spans.

    A token position is *removed* when it falls inside a maximal span of
    k-gram positions whose k-gram occurs elsewhere in the corpus AND whose
    occurrence is not the gram's first under the stable global order
    ``(doc_id, pos)`` — so exactly one copy of every duplicated substring
    survives (Lee et al. 2022's transform; first-wins like line_dedup).

    Returns ``(id, n_tokens, n_removed, text_clean)``. The span merge uses
    the same gap-free criterion as :func:`substring_dedup`, so
    ``n_removed`` is the exact size of the union of removed-gram token
    intervals.

    Scale shape: two hash aggregations on the uniform 64-bit gram hash —
    per-(gram, doc) min position, then per-gram count/first-doc/first-pos
    (see inline note: the struct-min this replaces could not
    hash-aggregate) — with map-side partials at both stages (hot
    stop-phrase grams collapse before each exchange), one hash-equi join
    back, one per-doc window, and a per-doc interval array (bounded by
    document size) consumed by a higher-order filter — no Python UDFs.
    """
    split_toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # NULL text must yield an empty token array (split(NULL) is NULL and
    # would propagate a NULL text_clean where the contract says "").
    toks_expr = F.when(
        F.col(text_col).isNull(), F.array().cast("array<string>")
    ).otherwise(split_toks)
    n_tokens = F.size(toks_expr)
    base = df.select(
        F.col(id_col).alias("__id"),
        n_tokens.cast("long").alias("n_tokens"),
        toks_expr.alias("__toks"),
    )
    # round 7: same dual-consumption barrier as substring_dedup
    exploded = _exploded_grams(df, k, id_col, text_col).localCheckpoint(eager=False)
    # first-occurrence = lexicographic min over (id, pos). A direct
    # min(struct(__id, __pos)) cannot hash-aggregate (struct agg buffers
    # are not mutable), so it planned as Sort → SortAggregate → Exchange →
    # Sort → SortAggregate over the FULL exploded gram table. Decomposed
    # into two hash aggregations instead: per-(gram, doc) min position
    # first (makes (h, id) unique, collapsing within-doc repeats map-side),
    # then per-gram min doc id + min_by(its min-pos, doc id) — min_by is
    # deterministic here because stage one left one row per (h, id). All
    # longs → HashAggregate, no sorts; the per-(h, id) partial agg spreads
    # hot stop-grams across partitions even better than keying by h alone
    # (sf1.0: the two full sorts of 2.6M gram rows disappear).
    per_doc = exploded.groupBy("__h", "__id").agg(
        F.min("__pos").alias("__mp"),
        F.count(F.lit(1)).alias("__ci"),
    )
    first = per_doc.groupBy("__h").agg(
        F.sum("__ci").alias("__c"),
        F.min("__id").alias("__fid"),
        F.min_by("__mp", "__id").alias("__fpos"),
    )
    # restrict to duplicated grams BEFORE the join (identical result: the
    # inner join + __c >= 2 filter discards singleton grams either way) —
    # the join's build side shrinks from every distinct gram to just the
    # duplicated ones, a stable small broadcast instead of a
    # threshold-straddling one that AQE flaps on
    dup_first = first.where(F.col("__c") >= 2)
    removed = (
        exploded.join(dup_first, "__h")
        .filter(
            (F.col("__id") != F.col("__fid")) | (F.col("__pos") != F.col("__fpos"))
        )
        .select("__id", "__pos")
    )

    w = Window.partitionBy("__id").orderBy("__pos")
    new_span = F.when(
        F.col("__pos") - F.lag("__pos").over(w) > k, F.lit(1)
    ).otherwise(F.lit(0))
    spans = removed.withColumn(
        "__span",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = (
        spans.groupBy("__id", "__span")
        .agg(
            F.min("__pos").alias("__s"),
            (F.max("__pos") + k - 1).alias("__e"),
        )
        .groupBy("__id")
        .agg(
            F.collect_list(F.struct("__s", "__e")).alias("__iv"),
            F.sum(F.col("__e") - F.col("__s") + 1).alias("n_removed"),
        )
    )
    joined = base.join(intervals, "__id", "left")
    iv = F.coalesce(
        F.col("__iv"), F.array().cast("array<struct<__s:int,__e:int>>")
    )
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.exists(
            iv, lambda s: (i >= s.getField("__s")) & (i <= s.getField("__e"))
        ),
    )
    return joined.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("text_clean"),
    )
