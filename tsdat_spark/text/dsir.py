"""DSIR-style importance weights for data selection (Xie et al. 2023).

"Data Selection for Language Models via Importance Resampling" (DSIR,
NeurIPS 2023) scores every raw document by the log-likelihood ratio of a
target-domain bag-of-ngrams model over a raw-corpus model, then resamples
proportionally to the weight. The published recipe hashes n-grams into a
fixed bucket table; this implementation uses exact word unigrams — the
Spark *shape* is identical (the hash only renames the grouping key) and
exact keys keep the operator oracle-checkable against another engine.

Both models are add-1-smoothed unigram distributions over the SHARED raw
vocabulary:

    p_t(w) = (c_t(w) + 1) / (T_t + V)      p_r(w) = (c_r(w) + 1) / (T_r + V)

and the document weight is ``log w(x) = sum_i log(p_t(x_i) / p_r(x_i))``.
Each per-word log-ratio is quantized to ``round((ln p_t - ln p_r) * 1e6)``
BEFORE summation (the same trick as text/lm.py), so the per-document sum
is order-independent int64 arithmetic and bit-exact across engines.

Spark shape:
1. one explode + ONE ``groupBy(term)`` computing both models' counts
   (``count(*)`` and a conditional sum — the target flag rides the row),
   vocabulary-sized output (Heaps' law), localCheckpointed so the totals
   pass does not recompute the corpus scan;
2. three scalar totals (T_r, T_t, V) in one aggregate job;
3. per-(doc, term) tf counts — the second corpus-shuffle;
4. tf joins the quantized ratio table on ``term`` (vocabulary-sized right
   side: AQE broadcasts it at any realistic vocabulary; a 10M-word vocab
   at ~24 B/row is ~240 MB — beyond that Spark falls back to a sort-merge
   join on the same uniform key) and one per-doc sum finishes.

Selection policy is the caller's; ``selected = logw_micro > 0`` (document
looks more target-like than raw-like) is emitted as the default
deterministic gate — DSIR's Gumbel-noise resampling is a post-step on
these weights.

Reference analog: none in tsdat (LLM-training-data operator family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document quantized DSIR log importance weights.

    ``is_target`` marks the target-domain rows (boolean column over
    ``df``). Returns ``(id, n_tokens, logw_micro, selected)`` with
    ``logw_micro`` the int64 sum of per-token quantized log-ratios and
    ``selected = logw_micro > 0``. Empty/null documents score 0 and are
    not selected.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    words = df.select(
        F.col(id_col).alias("__id"),
        is_target.cast("long").alias("__tgt"),
        F.explode(toks).alias("term"),
    )
    vocab = (
        words.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum("__tgt").alias("c_t"),
        )
        .localCheckpoint()
    )
    totals = vocab.agg(
        F.sum("c_r"), F.sum("c_t"), F.count(F.lit(1))
    ).first()
    # SUM over an empty vocab is NULL (all-empty corpus): score everything 0.
    t_r, t_t, v = (int(x or 0) for x in totals)
    ratio = vocab.select(
        "term",
        F.round(
            (
                F.log((F.col("c_t") + 1).cast("double") / F.lit(float(t_t + v)))
                - F.log((F.col("c_r") + 1).cast("double") / F.lit(float(t_r + v)))
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("rq"),
    )
    tf = words.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(ratio, "term")
        .groupBy("__id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("rq")).alias("logw_micro"),
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logw_micro", F.lit(0)).cast("long").alias("logw_micro"),
            (F.coalesce("logw_micro", F.lit(0)) > 0).alias("selected"),
        )
    )
