"""Data retrieval: reader dispatch + per-input-key rules + priority merge.

The Spark re-expression of tsdat's retrieval stage
(``tsdat/io/retrievers/perform_data_retrieval.py:20-99``,
``input_key_retrieval_rules.py:13-36``, ``default_retriever.py:79-87``):

1. Every input key is read by the FIRST reader whose regex matches
   (:func:`tsdat_spark.io.readers.read_input`).
2. Every declared output variable is supplied by the FIRST input key (in
   caller order) that has a matching retrieval rule AND actually contains
   one of the rule's candidate source columns — tsdat's multi-source
   priority semantics ("the first matching source supplies each variable").
3. Retrieval-time converters (StringToDatetime, UnitsConverter, …) run as
   column expressions on the supplying key's scan.
4. Per-key frames are merged with a full outer join on the coordinate
   columns — the relational analog of tsdat's ``xr.merge`` of retrieved
   datasets on their shared coords.

Everything stays one lazy plan: each input key is scanned once, converters
are codegen'd expressions, and the merge join is on the (time, series-key)
coordinates both sides are already hashed by.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DatasetSpec
from .io.converters import UnitsConverter
from .io.readers import read_input


def _bind_output_units(conv, var: str, dataset: DatasetSpec):
    """UnitsConverter yaml nodes usually declare only input_units; the
    output units come from the dataset config's variable attrs
    (units_converter.py:100-114)."""
    if isinstance(conv, UnitsConverter) and conv.output_units is None:
        vspec = dataset.variables.get(var)
        out_units = (vspec.attrs.get("units") if vspec else None)
        return dataclasses.replace(conv, output_units=out_units)
    return conv


def _resolve(df_cols: dict[str, str], rule, input_key: str) -> str | None:
    if not rule.matches(input_key):
        return None
    for cand in rule.source_names:
        if cand.lower() in df_cols:
            return df_cols[cand.lower()]
    return None


def perform_data_retrieval(
    spark: SparkSession,
    input_keys: list[str],
    retriever,
    dataset: DatasetSpec,
) -> DataFrame:
    """Retrieve the declared variables from ``input_keys`` (see module doc).

    Returns the merged raw frame with OUTPUT variable names (standardize
    then enforces dtypes/fill/dedup on it).
    """
    readers = retriever.readers or None
    scans: dict[int, DataFrame] = {}

    def scan(ki: int) -> DataFrame:
        if ki not in scans:
            scans[ki] = read_input(spark, input_keys[ki], readers)
        return scans[ki]

    coord_names = [dataset.ts_col, *dataset.series_keys]

    # priority assignment: data var -> (key index, source column, rule)
    assigned: dict[str, tuple[int, str, object]] = {}
    for var, rules in retriever.rules.items():
        if var in coord_names:
            continue
        for ki in range(len(input_keys)):
            cols = {c.lower(): c for c in scan(ki).columns}
            for rule in rules:
                source = _resolve(cols, rule, input_keys[ki])
                if source is not None:
                    assigned[var] = (ki, source, rule)
                    break
            if var in assigned:
                break

    by_key: dict[int, list[tuple[str, str, object]]] = defaultdict(list)
    for var, (ki, source, rule) in assigned.items():
        by_key[ki].append((var, source, rule))
    if not by_key:
        # nothing matched any rule: single-input pass-through (standardize
        # will do same-name resolution), preserving tsdat's lenient default
        return scan(0)

    def coord_col(df: DataFrame, name: str, input_key: str) -> F.Column:
        """Coords are retrieved per input key from that key's own data
        (each retrieved variable rides its source dataset's coords)."""
        cols = {c.lower(): c for c in df.columns}
        for rule in retriever.rules.get(name, []):
            source = _resolve(cols, rule, input_key)
            if source is not None:
                col = F.col(source)
                for conv in rule.converters:
                    col = _bind_output_units(conv, name, dataset)(col)
                return col.alias(name)
        if name.lower() in cols:
            return F.col(cols[name.lower()]).alias(name)
        raise ValueError(f"input key {input_key!r} cannot supply coordinate {name!r}")

    frames = []
    for ki in sorted(by_key):
        df = scan(ki)
        sel = [coord_col(df, c, input_keys[ki]) for c in coord_names]
        for var, source, rule in by_key[ki]:
            col = F.col(source)
            for conv in rule.converters:
                col = _bind_output_units(conv, var, dataset)(col)
            sel.append(col.alias(var))
        frames.append(df.select(*sel))

    # relational xr.merge: full outer join on the shared coords
    return reduce(lambda a, b: a.join(b, coord_names, "full"), frames)
