"""Spark-vs-DuckDB parity on a representative query subset at sf0.001 —
the same comparison the driver's correctness gate performs (full sweep:
scripts/check_oracles.py)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SUBSET = [
    "rollup_1m",
    "tier_summary_1h",
    "qc_monotonic_value",
    "bin_average_30m",
    "dedup_exact",
    "minhash_signatures",
    "repetition_signals",
    "m4_downsample",
    "contamination_overlap",
    "neardup_cosine",
    "ivf_assign",
    "ivf_search",
    "sample_stratified",
    "top_tokens",
    "distinct_tier_hll",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from scripts.check_oracles import compare

    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    exp = duck.execute(entrymod.oracle_sql()[name]).df()
    issues = compare(name, got, exp)
    assert not issues, issues
