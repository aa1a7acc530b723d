"""Standardization stage: coerce raw input to the declared schema.

The relational re-expression of tsdat's retrieval + standardization steps
(``tsdat/pipeline/base/pipeline.py:59-148`` and
``tsdat/io/retrievers/_rename_variables.py:16-91``):

1. **rename** — each declared variable takes the first of its candidate
   source names present in the input (multi-candidate retrieval rules);
2. **drop** undeclared columns (column pruning — Catalyst then never reads
   them from parquet);
3. **add** missing declared variables as NULL (tsdat fills with
   ``_FillValue``; NULL is our internal missing encoding) and inject
   ``static_value`` constants (tsdat ``data:`` vars);
4. **cast** every column to its declared type;
5. **fill-value → NULL** for variables with a declared ``fill_value``
   (tsdat treats ``_FillValue`` as missing, ``check_missing.py:16-27``);
6. **time-range trim** (``storage_retriever.py:213-220``) — a plain
   predicate Catalyst pushes into the scan;
7. **dedup** on the declared primary key, keeping the first row by a
   deterministic ordering (stable (conv_id, turn_idx) invariant from
   BASELINE.json: per-turn text equality under stable turn ordering).

All steps are column expressions — zero shuffles except the optional dedup
(one hash aggregate, map-side combinable).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DatasetSpec


def standardize(
    df: DataFrame,
    spec: DatasetSpec,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """Coerce ``df`` to ``spec``'s declared schema (see module docstring).

    ``dedup_keys``: if given, keep exactly one row per key tuple — the one
    with the smallest ``(ts, <other declared cols>)`` — making downstream
    results independent of input row order and duplication.
    """
    cols = {c.lower(): c for c in df.columns}

    projected = []
    for name, var in spec.variables.items():
        source = None
        for cand in [*var.source_names, name]:
            if cand.lower() in cols:
                source = cols[cand.lower()]
                break
        if var.static_value is not None:
            col = F.lit(var.static_value)
        elif source is None:
            col = F.lit(None)
        else:
            col = F.col(source)
        col = col.cast(var.spark_type)
        if var.fill_value is not None:
            col = F.when(col == F.lit(var.fill_value), F.lit(None)).otherwise(col)
        projected.append(col.alias(name))

    ts_source = cols.get(spec.ts_col.lower(), spec.ts_col)
    out = df.select(F.col(ts_source).cast("timestamp").alias(spec.ts_col), *projected)

    if start is not None:
        out = out.where(F.col(spec.ts_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.where(F.col(spec.ts_col) <= F.lit(end).cast("timestamp"))

    if dedup_keys:
        value_cols = [c for c in out.columns if c not in dedup_keys]
        # min_by over a deterministic ordering struct: one shuffle, exact,
        # and (unlike dropDuplicates) independent of partition layout.
        order = F.struct(*[F.col(c) for c in [spec.ts_col, *sorted(set(value_cols) - {spec.ts_col})]])
        aggs = [F.min_by(F.col(c), order).alias(c) for c in value_cols]
        out = out.groupBy(*dedup_keys).agg(*aggs).select(*out.columns)

    return out


def with_token_len(df: DataFrame, text_col: str = "text", out_col: str = "token_len") -> DataFrame:
    """Whitespace token count; NULL text → NULL, empty string → 0."""
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    return df.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("int")).otherwise(toks.cast("int")),
    )


def with_turn_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    turn_col: str = "turn_idx",
    out_col: str = "latency_us",
) -> DataFrame:
    """Per-turn latency: microseconds since the previous turn of the same
    conversation under stable (conv_id, turn_idx) ordering. First turn → NULL.

    One window scan per series (sort-merge within partitions after a single
    hash repartition on conv_id).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(conv_col).orderBy(turn_col, ts_col)
    cur = F.unix_micros(F.col(ts_col))
    prev = F.lag(cur).over(w)
    return df.withColumn(out_col, (cur - prev).cast("long"))
