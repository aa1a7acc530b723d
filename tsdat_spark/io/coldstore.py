"""Gorilla-compressed cold tier: (series, day) blocks as binary rows.

The retention design: hot tiers stay row-oriented (queryable aggregates);
cold raw series compress into one Gorilla block per (series, day) —
delta-of-delta timestamps + XOR values (``tsdat_spark.compress.gorilla``) —
cutting cold storage ~10× while staying randomly accessible by (series,
day) partition pruning.

Spark plumbing: ``applyInPandas`` over (series, day) groups. Encoding is
the numpy-vectorized encoder (no per-point Python); groups are sorted
in-pandas (cheap: one day of one series). Decode explodes blocks back to
rows with ``mapInPandas`` — block boundaries never cross partition
boundaries so decode is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compress.gorilla import gorilla_decode, gorilla_encode


def encode_cold_blocks(
    df: DataFrame,
    series_keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ one row per (series, day): n_points, ts range, gorilla blob."""
    series_keys = list(series_keys)
    day = F.to_date(F.col(ts_col)).alias("p_date")
    binned = df.select(*series_keys, day, F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
                       F.col(value_col).cast("double").alias("__v"))
    by_name = {f.name: f.dataType.simpleString() for f in binned.schema.fields}
    key_schema = ", ".join(f"{k} {by_name[k]}" for k in series_keys)
    schema = f"{key_schema}, p_date date, n_points long, ts_min long, ts_max long, block binary"

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ts_us", kind="mergesort")
        ts = pdf["__ts_us"].to_numpy(np.int64)
        vals = pdf["__v"].to_numpy(np.float64, na_value=np.nan)
        head = pdf.iloc[:1][[*series_keys, "p_date"]].copy()
        head["n_points"] = len(pdf)
        head["ts_min"] = int(ts[0])
        head["ts_max"] = int(ts[-1])
        head["block"] = [gorilla_encode(ts, vals)]
        return head

    return binned.groupBy(*series_keys, "p_date").applyInPandas(encode, schema)


def decode_cold_blocks(
    blocks: DataFrame,
    series_keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Inverse of :func:`encode_cold_blocks` (row order within a block is
    ts-ascending)."""
    series_keys = list(series_keys)
    by_name = {f.name: f.dataType.simpleString() for f in blocks.schema.fields}
    key_schema = ", ".join(f"{k} {by_name[k]}" for k in series_keys)
    schema = f"{key_schema}, {ts_col} timestamp, {value_col} double"

    def decode(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ts, vals = gorilla_decode(row["block"])
                out = pd.DataFrame({ts_col: pd.to_datetime(ts, unit="us"), value_col: vals})
                for k in series_keys:
                    out[k] = row[k]
                outs.append(out[[*series_keys, ts_col, value_col]])
            yield pd.concat(outs) if outs else pd.DataFrame(columns=[*series_keys, ts_col, value_col])

    return blocks.mapInPandas(decode, schema)
