"""Distributed BPE (text/bpe.py) vs a pure-Python reference of the same
spec (Sennrich 2016 with the deterministic count-desc-then-lexicographic
tie-break): merge sequences must match EXACTLY, and corpus encoding must
match the driver-side encoder word for word.
"""

from __future__ import annotations

import collections

import pandas as pd

from tsdat_spark.text.bpe import EOW, encode_bpe, encode_word, train_bpe


# ---------------------------------------------------------------- reference

def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    vocab = collections.Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w) + (EOW,)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b, n))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_train_matches_reference_exactly(spark):
    got = train_bpe(_docs(spark, CORPUS), n_merges=12)
    want = _ref_train(CORPUS, 12)
    assert got == want
    # the distributed rounds (forced past the bounded driver path) must
    # produce the identical merge sequence
    dist = train_bpe(_docs(spark, CORPUS), n_merges=12, driver_vocab_limit=0)
    assert dist == want
    assert len(got) >= 8                      # the corpus supports many merges
    # the classic Sennrich demo: 'newest' dominates, 'es' merges early
    assert ("e", "s") in [(a, b) for a, b, _ in got[:4]]


def test_train_early_stop_no_repeats(spark):
    # every word unique once -> after exhausting shared prefixes the top
    # pair count drops below 2 and training stops early
    got = train_bpe(_docs(spark, ["ab cd", "ef gh"]), n_merges=50)
    assert got == _ref_train(["ab cd", "ef gh"], 50)
    assert len(got) < 50


def test_encode_matches_driver_reference(spark):
    merges = train_bpe(_docs(spark, CORPUS), n_merges=10)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = encode_bpe(_docs(spark, CORPUS), merges).orderBy("doc_id").collect()
    for row in out:
        want = []
        for w in row["text"].split():
            want.extend(encode_word(w, ranks))
        assert row["bpe_tokens"] == want
    # greedy merges reconstruct the original text exactly
    for row in out:
        joined = "".join(row["bpe_tokens"]).replace(EOW, " ").strip()
        assert joined == " ".join(row["text"].split())


def test_greedy_fold_overlapping_pairs(spark):
    # 'aaa' + merge (a,a): greedy left-to-right -> [aa, a, EOW]
    merges = [("a", "a", 99)]
    out = encode_bpe(_docs(spark, ["aaa"]), merges).collect()[0]
    assert out["bpe_tokens"] == ["aa", "a", EOW]
