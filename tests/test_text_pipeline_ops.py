"""Edge cases for the three corpus-preparation operators added round 5:
PII scrub (text/pii.py), corpus-level line dedup (text/lines.py) and
distributed-prefix-sum sequence packing (text/packing.py). The oracle gate
checks them value-exactly on the synthetic corpus; these tests pin the
edges the corpus doesn't contain (multi-match docs, within-doc duplicate
lines, boundary-straddling and zero-token docs, partition-boundary sums).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64", "text": "string"}
        )
    )


# ---------------------------------------------------------------- PII scrub

def test_pii_scrub_counts_and_redaction(spark):
    from tsdat_spark.text.pii import pii_scrub

    df = _docs(
        spark,
        [
            (1, "mail me at a.b+c@example.co.uk or x@y.io thanks"),
            (2, "server 192.168.0.1 and 10.0.255.17 up"),
            (3, "ssn 123-45-6789 phone (555) 867-5309 mixed"),
            (4, "nothing sensitive here"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (2, 0)
    assert "<EMAIL>" in out[1]["text_redacted"] and "@" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_redacted"] == "server <IP> and <IP> up"
    assert (out[3]["n_ssn"], out[3]["n_phone"]) == (1, 1)
    assert out[3]["text_redacted"] == "ssn <SSN> phone <PHONE> mixed"
    assert out[4]["text_redacted"] == "nothing sensitive here"
    assert out[4]["n_email"] == out[4]["n_ipv4"] == 0


def test_pii_counts_on_original_text_order_contract(spark):
    # An email whose local part looks like an SSN: counted by BOTH patterns
    # (counts are on the original text), but redacted as an email because
    # email applies first.
    from tsdat_spark.text.pii import pii_scrub

    df = _docs(spark, [(1, "id 123-45-6789@example.com end")])
    r = pii_scrub(df).collect()[0]
    assert r["n_email"] == 1 and r["n_ssn"] == 1
    assert r["text_redacted"] == "id <EMAIL> end"


# ---------------------------------------------------------------- line dedup

def test_line_dedup_first_occurrence_wins(spark):
    from tsdat_spark.text.lines import line_dedup, split_lines

    df = _docs(
        spark,
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma"),          # dupe of doc 1's line
            (3, "shared line"),                  # all lines duplicated
        ],
    )
    out = {r["doc_id"]: r for r in line_dedup(df, lines=split_lines(F.col("text"))).collect()}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["text_clean"] == "alpha shared line beta"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["text_clean"] == "gamma"
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 0)
    assert out[3]["text_clean"] == ""


def test_line_dedup_within_doc_duplicates(spark):
    from tsdat_spark.text.lines import line_dedup, split_lines

    df = _docs(spark, [(7, "same\nsame\nsame")])
    r = line_dedup(df, lines=split_lines(F.col("text"))).collect()[0]
    assert (r["n_lines"], r["n_kept"]) == (3, 1)
    assert r["text_clean"] == "same"


def test_chunk_tokens_edges(spark):
    from tsdat_spark.text.lines import chunk_tokens

    df = _docs(spark, [(1, "a b c d e"), (2, ""), (3, "  x  ")])
    out = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", chunk_tokens(F.col("text"), 3).alias("c")).collect()
    }
    assert out[1] == ["a b c", "d e"]   # tail chunk shorter, preserved
    assert out[2] == []
    assert out[3] == ["x"]


# ------------------------------------------------------------ pack sequences

def test_pack_sequences_matches_serial_cumsum(spark):
    from tsdat_spark.text.packing import pack_sequences

    rows = [(i, " ".join(["w"] * ((i * 37) % 90 + 1))) for i in range(200)]
    df = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=128, num_partitions=7).collect()
    }
    acc = 0
    for i in range(200):
        n = (i * 37) % 90 + 1
        r = out[i]
        assert r["n_tokens"] == n
        assert r["start_offset"] == acc, f"doc {i}"
        assert r["seq_id"] == acc // 128
        assert r["pos_in_seq"] == acc % 128
        assert r["n_spans"] == (acc + n - 1) // 128 - acc // 128 + 1
        acc += n


def test_pack_sequences_zero_token_doc_and_boundary(spark):
    from tsdat_spark.text.packing import pack_sequences

    # doc 0: exactly one sequence; doc 1: empty (0 tokens, occupies seq at
    # its offset, 1 span); doc 2 starts exactly on a boundary.
    df = _docs(spark, [(0, " ".join(["w"] * 4)), (1, ""), (2, "x y z")])
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_len=4, num_partitions=2).collect()}
    assert (out[0]["seq_id"], out[0]["n_spans"]) == (0, 1)
    assert (out[1]["n_tokens"], out[1]["start_offset"], out[1]["n_spans"]) == (0, 4, 1)
    assert (out[2]["start_offset"], out[2]["seq_id"], out[2]["pos_in_seq"]) == (4, 1, 0)


def test_pack_sequences_rejects_bad_seq_len(spark):
    from tsdat_spark.text.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, "a")]), seq_len=0)
