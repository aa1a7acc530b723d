"""Nearest-neighbor regridding (as-of both directions with tolerance).

Reference semantics: ``xr.reindex_like(method="nearest", tolerance=range)``
(``tsdat/transform_v2/nearest_neighbor/calculate_nearest_neighbor.py:8-41``),
golden behavior in ``test/io/test_transform_v2.py:275-305`` — ties between
the earlier and later sample resolve to the **later** one, tolerance is
inclusive.

Spark-first formulation: instead of a range join, the grid labels are
UNIONed with the data rows per series and a single ordered window pass
carries the last/next sample to every label (`last(..., ignorenulls)` /
`first(..., ignorenulls)` over half-open frames) — the classic skew-safe
as-of-join-by-union. One shuffle (the window exchange), no join, linear in
rows, and a mega-series spreads across tasks within its partition's sort
rather than building any per-key hash table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .bin_average import QC_BAD, QC_OUTSIDE_RANGE
from .grid import GridSpec, grid_dataframe


def nearest_neighbor(
    df: DataFrame,
    grid: GridSpec,
    series_keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tolerance_s: float,
) -> DataFrame:
    """Reindex ``value_cols`` onto the grid labels by nearest ``ts`` within
    ``tolerance_s`` seconds. Output: series keys, label, per-var value and
    ``qc_<var>`` (0 ok, 129 = QC_OUTSIDE_RANGE|QC_BAD when no sample in
    range — the transform-failed encoding of ``_perform_bin_average_qc_checks``)."""
    spark = df.sparkSession
    tol_us = tolerance_s * 1_000_000.0

    payload = F.struct(
        F.unix_micros(F.col(ts_col)).cast("double").alias("ts_us"),
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )
    data = df.select(*series_keys, F.unix_micros(F.col(ts_col)).cast("double").alias("__pos"),
                     F.lit(0).alias("__is_grid"), payload.alias("__p"))

    series = df.select(*series_keys).distinct()
    grid_rows = series.crossJoin(F.broadcast(grid_dataframe(spark, grid))).select(
        *series_keys,
        F.unix_micros(F.col("label")).cast("double").alias("__pos"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast(data.schema["__p"].dataType).alias("__p"),
    )

    u = data.unionByName(grid_rows)
    w = W.partitionBy(*series_keys).orderBy("__pos", "__is_grid")
    prev = F.last("__p", ignorenulls=True).over(w.rowsBetween(W.unboundedPreceding, 0))
    # "next" as a REVERSED running-last, not first() over an
    # UnboundedFollowing frame: Spark evaluates following-frame aggregates
    # by rescanning to the partition end for every row — O(n²) per series
    # (measured: 171 s vs 5 s on the sf0.1 grid). The reverse sort keeps it
    # linear; ties (data at exactly the label) still resolve into `prev`
    # because is_grid DESC puts the grid row before same-pos data rows.
    w_rev = W.partitionBy(*series_keys).orderBy(F.col("__pos").desc(), F.col("__is_grid").desc())
    nxt = F.last("__p", ignorenulls=True).over(w_rev.rowsBetween(W.unboundedPreceding, 0))
    u = (
        u.withColumn("__prev", prev)
        .withColumn("__next", nxt)
        .where(F.col("__is_grid") == 1)
    )

    d_prev = F.col("__pos") - F.col("__prev.ts_us")
    d_next = F.col("__next.ts_us") - F.col("__pos")
    pick_next = F.col("__next").isNotNull() & (F.col("__prev").isNull() | (d_next <= d_prev))
    chosen = F.when(pick_next, F.col("__next")).otherwise(F.col("__prev"))
    dist = F.when(pick_next, d_next).otherwise(d_prev)
    in_range = chosen.isNotNull() & (dist <= F.lit(tol_us))

    out = [*series_keys, F.timestamp_micros(F.col("__pos").cast("long")).alias("label")]
    for v in value_cols:
        out.append(F.when(in_range, chosen[v]).alias(v))
        out.append(F.when(in_range, 0).otherwise(QC_OUTSIDE_RANGE + QC_BAD).cast("int").alias(f"qc_{v}"))
    return u.select(*out)
