"""Edge cases for the repetition quality signals (queries.q_repetition_signals):
the max-run-length fold over the sorted bigram array must equal the true
top-bigram multiplicity for empty/single-token/uniform/mixed documents —
cases the synthetic corpus doesn't necessarily contain."""

from __future__ import annotations

import pytest


CASES = [
    # (text, n_tokens, dup_token_frac, top_bigram_frac)
    ("", 0, 0.0, 0.0),
    ("word", 1, 0.0, 0.0),
    ("a a a a a", 5, 0.8, 1.0),                    # one bigram repeated 4/4
    ("a b a b a", 5, 0.6, 0.5),                    # "a b" 2 of 4 bigrams
    ("w x y z", 4, 0.0, round(1 / 3, 6)),          # all distinct bigrams
    ("  spaced   out  ", 2, 0.0, 1.0),             # empty tokens filtered
]


@pytest.mark.parametrize("text,n,dup,top", CASES)
def test_repetition_signals_edges(spark, tmp_path, text, n, dup, top):
    import pandas as pd

    from tsdat_spark import queries as Q

    sf_dir = str(tmp_path)
    pd.DataFrame({"doc_id": [1], "text": [text], "source": ["s"]}).to_parquet(
        f"{sf_dir}/documents.parquet")
    row = Q.q_repetition_signals(spark, sf_dir).collect()[0]
    assert row["n_tokens"] == n
    assert row["dup_token_frac"] == pytest.approx(dup, abs=1e-6)
    assert row["top_bigram_frac"] == pytest.approx(top, abs=1e-6)
