"""N-gram LM perplexity scoring (text/lm.py) — CCNet-style quality filter.

The oracle gate checks lm_perplexity value-exactly against DuckDB on the
synthetic corpus; these tests pin the model itself against a pure-Python
reference implementation of the same spec, the empty/degenerate edges, and
the bounded-vocabulary broadcast mode the 100 TB deployment uses.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tsdat_spark.text.lm import LAM, LAM2, score_perplexity, train_bigram_lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat and the dog"),
    (3, "completely novel wording here"),
    (4, ""),          # zero tokens
    (5, "   "),       # whitespace only -> zero tokens
    (6, None),        # NULL text: excluded entirely (reference convention)
    (7, "the the the the"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64", "text": "string"})
    )


def _py_reference(rows):
    """The same model in plain Python: interpolated bigram, add-one
    unigram, per-token micro-nat quantization."""
    tokens = {i: [w for w in (t or "").lower().split(" ") if w]
              for i, t in rows if t is not None}
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ws in tokens.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    T, V = sum(uni.values()), len(uni)
    out = {}
    for i, ws in tokens.items():
        nll = 0
        for k, w in enumerate(ws):
            u = (uni.get(w, 0) + 1) / float(T + V)
            if k == 0:
                p = u
            else:
                p = LAM * (bi.get((ws[k - 1], w), 0) / uni[ws[k - 1]]) + LAM2 * u
            # Spark F.round is HALF_UP (away from zero), like Python's
            # decimal ROUND_HALF_UP — not banker's round()
            x = math.log(p) * 1000000.0
            nll -= math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        ms = len(ws)
        out[i] = (ms, nll, 0 if ms == 0 else nll // (ms * 1000))
    return out


def test_matches_pure_python_reference(spark):
    d = _df(spark)
    uni, bi, T, V = train_bigram_lm(d)
    got = {r["doc_id"]: (r["n_tokens"], r["nll_micro"],
                         r["nll_per_token_milli"])
           for r in score_perplexity(d, uni, bi, T, V).collect()}
    exp = _py_reference(DOCS)
    assert got == exp
    assert 6 not in got  # NULL text excluded
    assert got[4] == (0, 0, 0) and got[5] == (0, 0, 0)


def test_score_structure_properties(spark):
    d = _df(spark)
    uni, bi, T, V = train_bigram_lm(d)
    r = {x["doc_id"]: x for x in score_perplexity(d, uni, bi, T, V).collect()}
    # docs 0 and 1 are structurally identical under the trained counts
    # (cat/dog and mat/log have equal counts everywhere) -> equal scores
    assert r[0]["nll_micro"] == r[1]["nll_micro"]
    # "the the ..." pays for the ambiguous history (c2(the,the)=3 of
    # c1(the)=8) -> strictly worse per token than the determinized doc 0
    assert r[7]["nll_per_token_milli"] > r[0]["nll_per_token_milli"]
    # every non-empty doc gets a positive finite integer score
    assert all(r[i]["nll_micro"] > 0 for i in (0, 1, 2, 3, 7))


def test_bounded_vocab_folds_to_oov_and_broadcasts(spark):
    d = _df(spark)
    uni, bi, T, V = train_bigram_lm(d, vocab_limit=3)
    # vocabulary is exactly top-3 + the OOV bucket
    vocab = {r["w"] for r in uni.collect()}
    assert len(vocab) == 4 and "\x00oov" in vocab and "the" in vocab
    # totals unchanged by folding
    assert T == sum(r["c1"] for r in uni.collect())
    scored = score_perplexity(d, uni, bi, T, V, broadcast_grams=True)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["doc_id"]: r for r in scored.collect()}
    # scoring tokens aren't folded -> unseen words back off to the unigram
    # floor; every document still gets a finite exact score
    assert all(rows[i]["nll_micro"] > 0 for i in (0, 1, 2, 3, 7))


def test_score_unseen_corpus_with_trained_lm(spark):
    """Production shape: train on one corpus, score another (unseen
    words/histories hit the add-one floor and the unigram backoff)."""
    train = _df(spark)
    uni, bi, T, V = train_bigram_lm(train)
    new = _df(spark, [(100, "the cat sat"), (101, "zzz qqq www")])
    r = {x["doc_id"]: x for x in score_perplexity(new, uni, bi, T, V).collect()}
    assert r[100]["nll_per_token_milli"] < r[101]["nll_per_token_milli"]
    assert r[101]["n_tokens"] == 3 and r[101]["nll_micro"] > 0


def test_shared_tokenized_frame_parity(spark):
    """train+score over one shared pre-tokenized (checkpointed) frame —
    the q_lm_perplexity shape that tokenizes the corpus once instead of
    three times — is row-identical to the per-call tokenization path."""
    from tsdat_spark.text.lm import _tokenized

    d = _df(spark)
    uni_a, bi_a, T_a, V_a = train_bigram_lm(d)
    a = score_perplexity(d, uni_a, bi_a, T_a, V_a)

    dt = _tokenized(d.select("doc_id", "text")).select(
        "doc_id", "ws").localCheckpoint(eager=False)
    uni_b, bi_b, T_b, V_b = train_bigram_lm(d, tokenized=dt)
    b = score_perplexity(d, uni_b, bi_b, T_b, V_b, tokenized=dt)

    assert (T_a, V_a) == (T_b, V_b)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
