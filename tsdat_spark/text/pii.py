"""PII detection and redaction over a text column.

Web-scale training-data pipelines scrub personally identifiable
information before anything else touches the corpus (see e.g. the
BigCode/StarCoder and RefinedWeb data-preparation write-ups). This module
is the Spark-native version: every pattern is a single JVM-side
``regexp_replace`` / ``regexp_count`` expression, so the scrub is one
codegen'd map over the corpus — no Python in the hot path, no shuffle,
linear at any corpus size.

The built-in patterns are written in the RE2 ∩ ``java.util.regex`` common
subset (the same discipline as ``queries.BPE_TOKEN_PATTERN``) so the
DuckDB oracle matches byte-for-byte: ASCII classes only, no backrefs, no
lookaround.

Redaction order is part of the contract: patterns apply in the order
given, each over the output of the previous one, while per-type match
counts are taken on the ORIGINAL text. Both engines follow the same rule,
so overlapping matches (a phone number inside an email local-part) resolve
identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) in application order. Kept deliberately
#: conservative — high-precision patterns a pipeline can extend per-corpus.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\) ?\d{3}-\d{4}", "<PHONE>"),
]


def pii_counts(text: Column, patterns=None) -> list[Column]:
    """Per-type match-count columns (on the unredacted text)."""
    pats = patterns if patterns is not None else DEFAULT_PII_PATTERNS
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in pats
    ]


def pii_redact(text: Column, patterns=None) -> Column:
    """Sequentially redact every pattern; one codegen'd expression tree."""
    pats = patterns if patterns is not None else DEFAULT_PII_PATTERNS
    out = text
    for _, pat, repl in pats:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Detect + redact PII: id columns, per-type counts, redacted text.

    Map-only — the plan is a parquet scan feeding one projection; scales
    linearly with corpus size and never shuffles.
    """
    ids = id_cols if id_cols is not None else ["doc_id"]
    text = F.col(text_col)
    return df.select(
        *ids,
        *pii_counts(text, patterns),
        pii_redact(text, patterns).alias("text_redacted"),
    )
