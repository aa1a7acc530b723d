"""Property-based tests for the round-6 corpus operators: random tiny
corpora vs an independent pure-Python reference (substring family) and vs
Spark's own anti-join (bloom), sweeping cases goldens can't."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tsdat_spark.text.bloom import bloom_dedup
from tsdat_spark.text.substring import substring_dedup, substring_scrub

K = 3
WORDS = ["a", "b", "c"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _ref(docs, k):
    """Independent O(n^2) reference for dup-span stats and scrub."""
    toks = {i: [w for w in t.split(" ") if w] for i, t in docs}
    grams = {}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - k + 1):
            grams.setdefault(tuple(tk[p : p + k]), []).append((i, p))
    dup_pos = {i: [] for i in toks}
    removed_pos = {i: [] for i in toks}
    for occ in grams.values():
        if len(occ) >= 2:
            first = min(occ)
            for (i, p) in occ:
                dup_pos[i].append(p)
                if (i, p) != first:
                    removed_pos[i].append(p)

    def spans(ps):
        out = []
        for p in sorted(ps):
            if out and p - out[-1][1] <= k:
                out[-1][1] = p
            else:
                out.append([p, p])
        return out

    stats, scrub = {}, {}
    for i in toks:
        sp = spans(dup_pos[i])
        stats[i] = (
            len(toks[i]),
            len(dup_pos[i]),
            len(sp),
            sum(e - s + k for s, e in sp),
        )
        cut = set()
        for s, e in spans(removed_pos[i]):
            cut.update(range(s, e + k))
        kept = [w for j, w in enumerate(toks[i]) if j not in cut]
        n_removed = sum(
            e + k - s for s, e in spans(removed_pos[i])
        )
        scrub[i] = (len(toks[i]), n_removed, " ".join(kept))
    return stats, scrub


@settings(max_examples=8, deadline=None)
@given(corpus_strategy)
def test_substring_family_matches_pure_python_reference(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stats_ref, scrub_ref = _ref(docs, K)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_kgrams"], r["n_spans"], r["dup_tokens"])
        for r in substring_dedup(df, k=K).collect()
    }
    assert got == stats_ref

    got2 = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in substring_scrub(df, k=K).collect()
    }
    assert got2 == scrub_ref


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=30),
    st.sampled_from([64, 256, 4096]),
)
def test_bloom_dedup_always_equals_antijoin(spark, key_ids, n_bits):
    rows = [(i, f"k{k}") for i, k in enumerate(key_ids)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter(F.col("doc_id") % 2 == 1)
    hist = df.filter(F.col("doc_id") % 2 == 0)
    got = sorted(
        r["doc_id"]
        for r in bloom_dedup(new, hist, F.col("text"), n_bits=n_bits,
                             n_hashes=3).collect()
    )
    exp = sorted(
        r["doc_id"]
        for r in new.join(hist.select("text").distinct(), "text",
                          "left_anti").collect()
    )
    assert got == exp
