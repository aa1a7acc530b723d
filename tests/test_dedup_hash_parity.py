"""Round-7 optimization parity: the composed per-token (P, G) hash pipeline
and the explode-join Jaccard must be bit-identical to the definitional
forms they replaced (text/dedup.py round-7 note)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsdat_spark.text.dedup import (
    EMPTY_HASH,
    char_hash,
    jaccard_pairs,
    shingle_hashes_pg,
    shingles,
    token_hashes_pg,
    token_pg,
    tokens,
)


EDGE_ROWS = [
    (1, None, "s0"),
    (2, "", "s0"),
    (3, "one", "s0"),
    (4, "two tok", "s1"),
    (5, "exactly three tokens", "s1"),
    (6, "a  b   c  d repeated a  b   c  d", "s1"),
    (7, "   ", "s2"),
    (8, "unicode déjà vu naïve café crème", "s2"),
    (9, "w x y z w x y z w x y z", "s2"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id long, text string, source string")


def test_empty_hash_constant(spark):
    got = spark.range(1).select(char_hash(F.lit("")).alias("h")).first()["h"]
    assert got == EMPTY_HASH == 217


def test_shingle_hashes_pg_matches_char_hash(docs):
    # definitional: hash each shingle string; composed: per-token (P, G)
    tk = F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))
    both = docs.select(
        "doc_id",
        F.transform(shingles(F.col("text"), 3), char_hash).alias("ref"),
        shingle_hashes_pg(token_pg(tk), 3).alias("got"),
    ).collect()
    for r in both:
        assert r["ref"] == r["got"], f"doc {r['doc_id']}: {r['ref']} != {r['got']}"


def test_token_hashes_pg_matches_char_hash(docs):
    tk = F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))
    both = docs.select(
        "doc_id",
        F.transform(tk, char_hash).alias("ref"),
        token_hashes_pg(token_pg(tk)).alias("got"),
    ).collect()
    for r in both:
        assert r["ref"] == r["got"], f"doc {r['doc_id']}: {r['ref']} != {r['got']}"


def _ref_jaccard(docs, block_col=None):
    """The replaced array_intersect/array_union formulation."""
    base = docs.select(
        F.col("doc_id"),
        *([F.col(block_col)] if block_col else []),
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
    )
    l, r = base.alias("l"), base.alias("r")
    cond = F.col("l.doc_id") < F.col("r.doc_id")
    joined = (
        l.join(r, [block_col], "inner").where(cond)
        if block_col
        else l.crossJoin(r).where(cond)
    )
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    return joined.select(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
        F.round(inter.cast("double") / union, 6).alias("jaccard"),
    )


def test_jaccard_pairs_matches_definitional_blocked(docs):
    got = {tuple(r) for r in jaccard_pairs(docs, block_col="source").collect()}
    ref = {tuple(r) for r in _ref_jaccard(docs, "source").collect()}
    assert got == ref


def test_jaccard_pairs_matches_definitional_cross(docs):
    got = {tuple(r) for r in jaccard_pairs(docs).collect()}
    ref = {tuple(r) for r in _ref_jaccard(docs).collect()}
    assert got == ref
    # zero-overlap pairs must be present with jaccard exactly 0.0
    assert any(j == 0.0 for (_, _, j) in got)
