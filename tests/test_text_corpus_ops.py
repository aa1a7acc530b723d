"""Substring dup-span detection, Bloom incremental dedup, TF-IDF top-k."""

import math

import pytest
from pyspark.sql import functions as F

from tsdat_spark.text.bloom import bloom_contains, bloom_dedup, build_bloom
from tsdat_spark.text.substring import kgram_hashes, substring_dedup
from tsdat_spark.text.tfidf import tfidf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- substring


def test_substring_shared_phrase_one_span(spark):
    # docs 1 and 2 share the 6-token phrase -> 3 duplicated 4-grams each,
    # merged into ONE span covering 6 tokens.
    phrase = "alpha beta gamma delta epsilon zeta"
    d = _docs(
        spark,
        [
            (1, f"u1 u2 {phrase} u3"),
            (2, f"{phrase} v1 v2 v3 v4"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
    )
    out = {
        r["doc_id"]: r for r in substring_dedup(d, k=4).collect()
    }
    for doc in (1, 2):
        assert out[doc]["n_dup_kgrams"] == 3
        assert out[doc]["n_spans"] == 1
        assert out[doc]["dup_tokens"] == 6
    assert out[3]["n_dup_kgrams"] == 0
    assert out[3]["n_spans"] == 0
    assert out[3]["dup_tokens"] == 0
    assert out[3]["n_tokens"] == 8


def test_substring_within_doc_repetition_counts(spark):
    # a doc repeating its own 4-gram is corpus-duplicated (count >= 2)
    d = _docs(spark, [(1, "a b c d x y z a b c d")])
    row = substring_dedup(d, k=4).collect()[0]
    # positions 0 and 7 hold the duplicated gram "a b c d"; gap 7 > k -> 2 spans
    assert row["n_dup_kgrams"] == 2
    assert row["n_spans"] == 2
    assert row["dup_tokens"] == 8


def test_substring_short_null_and_empty_docs(spark):
    d = _docs(spark, [(1, "a b c"), (2, None), (3, ""), (4, "a b c")])
    out = {r["doc_id"]: r for r in substring_dedup(d, k=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    for doc in out.values():
        assert doc["n_dup_kgrams"] == 0  # all shorter than k
    assert out[2]["n_tokens"] == 0
    assert out[3]["n_tokens"] == 0


def test_substring_adjacent_grams_merge(spark):
    # 5-token shared phrase, k=4 -> positions p and p+1: one span of 5 tokens
    d = _docs(spark, [(1, "p q r s t"), (2, "z1 p q r s t z2")])
    out = {r["doc_id"]: r for r in substring_dedup(d, k=4).collect()}
    assert out[1]["n_dup_kgrams"] == 2
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 5


def test_kgram_hashes_matches_manual(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    grams = df.select(kgram_hashes(F.col("text"), 4).alias("g")).first()["g"]
    manual = df.select(
        F.xxhash64(F.lit("a b c d")), F.xxhash64(F.lit("b c d e"))
    ).first()
    assert grams == [manual[0], manual[1]]


# ------------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    d = spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bm = build_bloom(d, F.col("k"), n_bits=1 << 14, n_hashes=5)
    hits = bloom_contains(d, F.col("k"), bm).agg(
        F.sum(F.col("__bloom_hit").cast("int"))
    ).first()[0]
    assert hits == 500  # every inserted key must test positive


def test_bloom_dedup_exact_vs_antijoin(spark):
    d = spark.createDataFrame(
        [(i, f"t{i % 40}") for i in range(200)], "doc_id long, text string"
    )
    new = d.filter(F.col("doc_id") % 2 == 1)
    hist = d.filter(F.col("doc_id") % 2 == 0)
    got = bloom_dedup(new, hist, F.col("text"), n_bits=1 << 10)
    exp = new.join(hist.select("text").distinct(), "text", "left_anti")
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in exp.collect()
    )


def test_bloom_dedup_exact_under_heavy_false_positives(spark):
    # 64 bits for 100 keys: the bloom is saturated, nearly everything is a
    # candidate — the confirm join must still produce the exact answer.
    d = spark.createDataFrame(
        [(i, f"u{i}") for i in range(200)], "doc_id long, text string"
    )
    new = d.filter(F.col("doc_id") >= 100)
    hist = d.filter(F.col("doc_id") < 100)
    got = bloom_dedup(new, hist, F.col("text"), n_bits=64, n_hashes=3)
    assert got.count() == 100  # all new keys distinct from history


def test_bloom_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError):
        build_bloom(spark.range(1), F.col("id").cast("string"), n_bits=1001)


# ------------------------------------------------------------------- tfidf


def test_tfidf_scores_and_ties(spark):
    d = _docs(
        spark,
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common common"),
        ],
    )
    out = tfidf_top_terms(d, top_k=3)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    n = 3

    def idf_q(df_docs):
        return round(math.log((n + 1) / (df_docs + 1)) * 1e6)

    r = rows[(1, "apple")]
    assert (r["tf"], r["df_docs"]) == (2, 1)
    assert r["score_q"] == 2 * idf_q(1)
    assert r["rank"] == 1
    # doc 2: banana and cherry tie on tf; cherry (df=1) outranks banana (df=2)
    assert rows[(2, "cherry")]["rank"] == 1
    assert rows[(2, "banana")]["rank"] == 2
    # common appears in every doc: idf_q = 0 -> score 0, still listed last
    assert rows[(1, "common")]["score_q"] == 0


def test_tfidf_equal_scores_tiebreak_by_term(spark):
    d = _docs(spark, [(1, "zebra apple"), (2, "other words")])
    rows = tfidf_top_terms(d, top_k=2).filter(F.col("doc_id") == 1).collect()
    ranked = sorted(rows, key=lambda r: r["rank"])
    assert [r["term"] for r in ranked] == ["apple", "zebra"]


def test_tfidf_empty_docs_emit_no_rows(spark):
    d = _docs(spark, [(1, ""), (2, None), (3, "solo")])
    rows = tfidf_top_terms(d).collect()
    assert {r["doc_id"] for r in rows} == {3}


def test_substring_scrub_first_occurrence_survives(spark):
    phrase = "alpha beta gamma delta epsilon zeta"
    d = _docs(
        spark,
        [
            (1, f"u1 u2 {phrase} u3"),
            (2, f"{phrase} v1 v2 v3 v4"),
        ],
    )
    from tsdat_spark.text.substring import substring_scrub

    out = {r["doc_id"]: r for r in substring_scrub(d, k=4).collect()}
    # doc 1 holds the first occurrence (doc order) -> untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == f"u1 u2 {phrase} u3"
    # doc 2 loses the 6 phrase tokens, keeps the rest in order
    assert out[2]["n_removed"] == 6
    assert out[2]["text_clean"] == "v1 v2 v3 v4"


def test_substring_scrub_within_doc_keeps_first(spark):
    from tsdat_spark.text.substring import substring_scrub

    d = _docs(spark, [(1, "a b c d x y z a b c d")])
    row = substring_scrub(d, k=4).collect()[0]
    assert row["n_removed"] == 4
    assert row["text_clean"] == "a b c d x y z"


def test_substring_scrub_null_and_short_docs(spark):
    from tsdat_spark.text.substring import substring_scrub

    d = _docs(spark, [(1, None), (2, ""), (3, "a b"), (4, "a b")])
    out = {r["doc_id"]: r for r in substring_scrub(d, k=4).collect()}
    assert out[1]["text_clean"] == ""
    assert out[2]["text_clean"] == ""
    assert out[3]["text_clean"] == "a b"  # shorter than k: never duplicated
    assert out[4]["text_clean"] == "a b"
    assert all(r["n_removed"] == 0 for r in out.values())


# -------------------------------------------------------------------- dsir


def test_dsir_weights_match_manual_model(spark):
    from tsdat_spark.text.dsir import dsir_weights

    d = spark.createDataFrame(
        [
            (1, "en", "cat dog"),
            (2, "fr", "chien chat"),
            (3, "en", "cat cat"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(d, is_target=F.col("lang") == "en").collect()
    }
    # manual model: c_r = {cat:3, dog:1, chien:1, chat:1}, T_r=6;
    # c_t = {cat:3, dog:1, chien:0, chat:0}, T_t=4; V=4
    c_r = {"cat": 3, "dog": 1, "chien": 1, "chat": 1}
    c_t = {"cat": 3, "dog": 1, "chien": 0, "chat": 0}

    def rq(w):
        return round(
            (math.log((c_t[w] + 1) / 8.0) - math.log((c_r[w] + 1) / 10.0)) * 1e6
        )

    assert out[1]["logw_micro"] == rq("cat") + rq("dog")
    assert out[2]["logw_micro"] == rq("chien") + rq("chat")
    assert out[3]["logw_micro"] == 2 * rq("cat")
    assert out[1]["selected"] and out[3]["selected"]
    assert not out[2]["selected"]  # fr doc scores target-unlike


def test_dsir_empty_docs_score_zero(spark):
    from tsdat_spark.text.dsir import dsir_weights

    d = spark.createDataFrame(
        [(1, "en", "hello world"), (2, "en", None), (3, "fr", "")],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(d, is_target=F.col("lang") == "en").collect()
    }
    assert out[2]["logw_micro"] == 0 and not out[2]["selected"]
    assert out[3]["logw_micro"] == 0 and not out[3]["selected"]
    assert out[2]["n_tokens"] == 0


# -------------------------------------------------------------------- bm25


def test_bm25_matches_manual_formula(spark):
    from tsdat_spark.text.tfidf import bm25_top_terms

    d = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
    )
    rows = {
        (r["doc_id"], r["term"]): r for r in bm25_top_terms(d, top_k=4).collect()
    }
    n, avgdl = 3, (3 + 2 + 4) / 3.0
    k1, b = 1.2, 0.75

    def score_q(tf, df, dl):
        idf = math.log(1.0 + (float(n) - float(df) + 0.5) / (float(df) + 0.5))
        norm = (1.0 - b) + b * (float(dl) / avgdl)
        return round(idf * ((float(tf) * (k1 + 1.0)) / (float(tf) + k1 * norm)) * 1e6)

    r = rows[(1, "apple")]
    assert (r["tf"], r["df_docs"], r["dl"]) == (2, 1, 3)
    assert r["score_q"] == score_q(2, 1, 3)
    assert r["rank"] == 1
    # banana and cherry tie exactly in doc 2 (tf=1, df=2 for both):
    # equal scores, rank decided by the term-ASC tie-break
    assert rows[(2, "banana")]["score_q"] == rows[(2, "cherry")]["score_q"]
    assert rows[(2, "banana")]["rank"] < rows[(2, "cherry")]["rank"]
    assert rows[(3, "cherry")]["score_q"] == score_q(3, 2, 4)


def test_bm25_length_normalization_prefers_short_doc(spark):
    # same tf/df: the shorter document scores higher (BM25's dl/avgdl norm)
    from tsdat_spark.text.tfidf import bm25_top_terms

    d = _docs(spark, [(1, "x y"), (2, "x y filler1 filler2 filler3 filler4")])
    rows = {
        (r["doc_id"], r["term"]): r["score_q"]
        for r in bm25_top_terms(d, top_k=6).collect()
    }
    assert rows[(1, "x")] > rows[(2, "x")]


def test_dsir_all_empty_corpus_scores_zero(spark):
    from tsdat_spark.text.dsir import dsir_weights

    d = spark.createDataFrame(
        [(1, "en", None), (2, "fr", "")], "doc_id long, lang string, text string"
    )
    out = dsir_weights(d, is_target=F.col("lang") == "en").collect()
    assert {(r["doc_id"], r["logw_micro"], r["selected"]) for r in out} == {
        (1, 0, False), (2, 0, False)
    }


def test_normalize_text_edges(spark):
    import tempfile, os
    import pandas as pd

    from tsdat_spark.queries import q_normalize_text

    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {"doc_id": [1, 2, 3, 4],
         "text": ["Hello,  WORLD! 42", None, "!!!", "  a   b  "],
         "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [0] * 4}
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    out = {r["doc_id"]: r for r in q_normalize_text(spark, tmp).collect()}
    assert out[1]["text_norm"] == "hello world 42"
    assert out[1]["n_tokens_norm"] == 3
    assert out[2]["text_norm"] == "" and out[2]["n_tokens_norm"] == 0
    assert out[3]["text_norm"] == "" and out[3]["n_chars_norm"] == 0
    assert out[4]["text_norm"] == "a b" and out[4]["n_tokens_norm"] == 2
