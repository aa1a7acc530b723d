"""TF-IDF keyword extraction with integer-exact quantized scores.

Per-document top-k salient terms — the workhorse feature for corpus
exploration, topic tagging, and quality heuristics (Gopher's "valuable
document" signals and BM25-style retrieval both start from exactly these
tf/df statistics).

Spark shape (three shuffles total, all on unskewed keys, every aggregate
partial map-side):
1. explode tokens → ``groupBy(doc, term)`` count = **tf**;
2. reuse that result: ``groupBy(term)`` count = **df** (documents per
   term — each (doc, term) row is already distinct);
3. join tf×df on ``term`` (AQE broadcasts the vocabulary side when it
   fits — vocabularies obey Heaps' law, millions of rows at 100 TB, still
   broadcastable at ~100 MB; otherwise a sort-merge join on ``term``);
4. one window per doc for the top-k — Spark pushes the rank filter down
   as ``WindowGroupLimit``, so each partition keeps only k rows per doc
   BEFORE the exchange.

Scores are quantized so a DuckDB/other-engine oracle matches bit-for-bit:
``idf_q = round(ln((N+1)/(df+1)) * 1e6)`` as an integer (smoothed IDF,
scikit-learn's formula), ``score_q = tf * idf_q`` — pure int64 arithmetic
after one libm call whose cross-engine difference is ~1 ulp of a double,
nine orders below the quantization step. Ties break by term ASC,
deterministically.

Reference analog: none in tsdat (text-analysis family, cf. queries
token_count / text_quality / top_tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top ``top_k`` terms per document by quantized TF-IDF.

    Returns ``(id, term, tf, df_docs, score_q, rank)``; documents with no
    tokens contribute no rows. ``score_q = tf * round(ln((N+1)/(df+1))*1e6)``
    with N the total document count (including empty ones).
    """
    n_docs = df.count()
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    words = df.select(
        F.col(id_col).alias("__id"), F.explode(toks).alias("term")
    )
    # lazy checkpoint (round 7): the vocabulary aggregate and the scored
    # join both consume tf, and ReuseExchange does NOT deduplicate the two
    # branches (verified in the formatted plan) — without the barrier the
    # corpus explode + tf aggregation ran twice
    tf = words.groupBy("__id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    idf_q = F.round(
        F.log((F.lit(float(n_docs + 1))) / (F.col("df_docs") + F.lit(1)).cast("double"))
        * F.lit(1e6)
    ).cast("long")
    scored = tf.join(dfreq, "term").withColumn(
        "score_q", (F.col("tf") * idf_q).cast("long")
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("score_q").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("__id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df_docs").cast("long").alias("df_docs"),
            "score_q",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bm25_top_terms(
    df: DataFrame,
    top_k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top ``top_k`` terms per document by quantized BM25 (Robertson).

    ``score = idf(t) * (tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl)))``
    with ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's smoothed
    form), ``dl`` the document token count and ``avgdl = T/N_nonempty``.

    Cross-engine exactness: every float op is IEEE-deterministic given the
    same expression tree, which is pinned term-for-term in the DuckDB
    oracle (division before multiplication, ``(1-b)`` folded first, one
    ``ln``); the final score quantizes to ``round(score * 1e6)`` int64 so
    a sub-ulp ``ln`` difference cannot flip the hash. Same Spark shape as
    :func:`tfidf_top_terms` plus one scalar (T, N) pre-pass.
    """
    n_docs = df.count()
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    words = df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("term"))
    # lazy localCheckpoint: the avgdl pre-pass below materializes the
    # tokenize→explode→tf chain once; the main plan and the vocabulary
    # aggregate then reuse the blocks instead of recomputing it (same
    # pattern as dsir_weights' vocab checkpoint).
    tf = words.groupBy("__id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=False)
    # T and N_nonempty in one aggregate job (round 7): sum of tf is the
    # token total and countDistinct(__id) the non-empty doc count — the
    # same values the old per-doc dl aggregation produced, without
    # building that intermediate
    totals = tf.agg(F.sum("tf"), F.countDistinct("__id")).first()
    avgdl = float(totals[0]) / float(totals[1]) if totals[1] else 1.0
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df_docs").cast("double") + F.lit(0.5))
        / (F.col("df_docs").cast("double") + F.lit(0.5))
    )
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
    num = F.col("tf").cast("double") * F.lit(k1 + 1.0)
    den = F.col("tf").cast("double") + F.lit(k1) * norm
    score_q = F.round(idf * (num / den) * F.lit(1e6)).cast("long")

    # dl rides a window over the SAME __id partitioning the rank window
    # needs (round 7, guide §2.4): one exchange establishes it for both —
    # the old per-doc aggregate + equi-join re-shuffled tf twice
    scored = (
        tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("__id")))
        .join(dfreq, "term")
        .withColumn("score_q", score_q)
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("score_q").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("__id").alias(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df_docs").cast("long").alias("df_docs"),
            F.col("dl").cast("long").alias("dl"),
            "score_q",
            F.col("rank").cast("int").alias("rank"),
        )
    )
