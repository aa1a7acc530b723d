"""N-gram language-model perplexity scoring (CCNet-style quality filter).

The reference has no LM scorer; this is one of the engine's first-class
LLM-training-data operators (like ``text/pii.py`` / ``text/lines.py``):
CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters web text by per-document LM
perplexity — low-perplexity ≈ fluent prose, high ≈ boilerplate/garbled.
Production CCNet uses a pretrained KenLM; this module implements the
self-contained analog: an interpolated bigram model with add-one unigram
smoothing trained on the corpus itself (or any reference corpus), then a
map-shaped scoring pass.

Model (all arithmetic exactly reproducible in ANSI SQL, so the scorer is
oracle-checkable):

- tokens: lowercase whitespace split (the corpus convention shared with
  ``top_tokens`` / ``token_count``).
- first token of a document:      p(w)      = (c1(w)+1) / (T+V)
- subsequent tokens:              p(w|w_prev) =
      LAM * (c2(w_prev,w)/c1(w_prev)) + (1-LAM) * ((c1(w)+1)/(T+V))
  with c2 missing → 0; LAM = 0.9.
- per-token score is quantized IMMEDIATELY: lp_micro =
  round(ln(p)·1e6) as BIGINT. Sums of BIGINTs are associative, so the
  document NLL is bit-exact regardless of Spark's partition/accumulation
  order — float-sum nondeterminism never reaches the compared columns
  (the same idiom as the tier bracket-booleans, one step stronger).

100 TB shape: training is two vocabulary-sized groupBys (unigram, bigram
— map-side partial agg collapses each partition to its distinct grams
first); scoring joins token rows to the gram tables. The gram tables have
ONE row per key, so Zipf skew on the probe side is harmless (hash join
fan-out 1); with a bounded vocabulary (``vocab_limit`` top-V unigrams,
everything else folded to an OOV bucket) the tables broadcast and scoring
becomes a zero-shuffle map — the CCNet deployment shape (KenLM broadcast
to every executor). The oracle-suite entry trains unbounded on the test
corpus so DuckDB can reproduce it literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LAM = 0.9   # interpolation weight on the bigram maximum-likelihood term
LAM2 = 0.1  # unigram weight — its own literal: the oracle must reproduce
#             the exact IEEE double, and 1.0-0.9 != 0.1 in binary64

_TOKENS = "filter(split(lower(text), ' '), x -> x != '')"


def _tokenized(docs: DataFrame, text_col: str = "text") -> DataFrame:
    expr = _TOKENS.replace("text", text_col)
    return docs.where(F.col(text_col).isNotNull()).withColumn(
        "ws", F.expr(expr))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    vocab_limit: int | None = None,
                    min_bigram_count: int = 1,
                    tokenized: DataFrame | None = None):
    """(unigrams, bigrams, T, V): corpus gram counts. ``vocab_limit``
    keeps the top-V tokens (count desc, token asc tie-break) and folds the
    tail into the OOV token ``"\\x00oov"`` — the bounded-vocabulary mode
    that makes the tables broadcastable at any corpus size.

    ``tokenized``: optional pre-tokenized frame (``_tokenized(docs)`` or a
    materialized equivalent carrying ``ws``). Training reads the corpus
    twice (unigram and bigram explodes) and scoring a third time, so a
    caller running train+score on the same corpus should tokenize once,
    ``localCheckpoint`` it, and pass it to both (guide §2.3: the
    tokenize+lower pass is the repeated heavy map)."""
    d = tokenized if tokenized is not None else _tokenized(docs, text_col)
    toks = d.select(F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    pairs = d.select(F.explode(F.expr(
        "transform(slice(ws, 1, greatest(size(ws)-1, 0)),"
        " (x, i) -> struct(x AS w1, element_at(ws, i+2) AS w2))"
    )).alias("p")).select("p.w1", "p.w2")
    if vocab_limit is not None:
        keep = uni.orderBy(F.desc("c1"), "w").limit(vocab_limit)
        marker = F.broadcast(keep.select("w", F.lit(True).alias("_keep")))

        def fold(df, col):
            m = marker.select(F.col("w").alias(col + "_k"),
                              F.col("_keep").alias(col + "_m"))
            return (df.join(m, df[col] == m[col + "_k"], "left")
                    .withColumn(col, F.when(F.col(col + "_m"), F.col(col))
                                .otherwise(F.lit("\x00oov")))
                    .drop(col + "_k", col + "_m"))

        toks = fold(toks, "w")
        uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
        pairs = fold(fold(pairs, "w1"), "w2")
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    if min_bigram_count > 1:
        bi = bi.where(F.col("c2") >= min_bigram_count)
    # gram tables are vocabulary-sized reusable artifacts: materialize once
    # (scoring references uni twice + bi once; without this every broadcast
    # build re-runs the corpus tokenization)
    uni = uni.localCheckpoint(eager=False)
    bi = bi.localCheckpoint(eager=False)
    tv = uni.agg(F.sum("c1").alias("T"), F.count(F.lit(1)).alias("V")).first()
    return uni, bi, int(tv["T"] or 0), int(tv["V"] or 0)


def score_perplexity(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                     T: int, V: int, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_grams: bool = False,
                     tokenized: DataFrame | None = None) -> DataFrame:
    """Per-document (id, n_tokens, nll_micro, nll_per_token_milli):
    nll_micro = -Σ round(ln(p)·1e6), an exact BIGINT (see module doc).
    ``broadcast_grams=True`` marks both gram tables broadcast — the
    bounded-vocabulary production path (zero-shuffle scoring).
    ``tokenized``: optional pre-tokenized frame shared with
    :func:`train_bigram_lm` (see its docstring)."""
    if broadcast_grams:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    d = tokenized if tokenized is not None else _tokenized(docs, text_col)
    tok = d.select(
        F.col(id_col),
        F.explode(F.expr(
            "transform(ws, (x, i) -> struct(i AS pos, x AS w,"
            " IF(i = 0, NULL, element_at(ws, i)) AS w_prev))")).alias("t"),
    ).select(id_col, "t.pos", "t.w", "t.w_prev")
    u_w = uni.select(F.col("w").alias("_uw"), F.col("c1").alias("c_w"))
    u_p = uni.select(F.col("w").alias("_up"), F.col("c1").alias("c_prev"))
    scored = (
        tok.join(u_w, tok["w"] == u_w["_uw"], "left")
        .join(u_p, tok["w_prev"] == u_p["_up"], "left")
        .join(bi, (tok["w_prev"] == bi["w1"]) & (tok["w"] == bi["w2"]),
              "left")
    )
    denom = F.lit(float(T + V))
    uni_term = (F.coalesce(F.col("c_w"), F.lit(0)) + F.lit(1)) / denom
    bigram = (F.lit(LAM) * (F.coalesce(F.col("c2"), F.lit(0)) / F.col("c_prev"))
              + F.lit(LAM2) * uni_term)
    # first token OR unseen history (c_prev null, bounded-vocab scoring of
    # a different corpus) → back off to the smoothed unigram
    lp = F.when(F.col("w_prev").isNull() | F.col("c_prev").isNull(),
                F.log(uni_term)).otherwise(F.log(bigram))
    per_tok = scored.select(
        id_col, F.round(lp * F.lit(1000000.0)).cast("long").alias("lp_micro"))
    agg = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (-F.sum("lp_micro")).alias("nll_micro"),
    )
    # identical row set to docs.where(text notNull).select(id): d IS that
    # frame plus the ws column (projection pruning drops ws on this branch)
    base = d.select(id_col)
    out = base.join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("nll_micro", F.lit(0)).alias("nll_micro"),
    )
    return out.withColumn(
        "nll_per_token_milli",
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            F.expr("nll_micro div (n_tokens * 1000)")).cast("long"),
    )
