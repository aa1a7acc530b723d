"""Linear interpolation onto a regular grid with tsdat transform_v2 QC.

Reference semantics (studied, not ported):
``tsdat/transform_v2/interpolate/calculate_linear_interpolation.py:25-174``
and ``_interpolate_single_point.py:1-34``:

- candidates for each output label are the input samples whose
  (center-aligned, diff-width) bins overlap the output bin
  ``[label − range, label + range)`` (the LinearInterpolate converter builds
  output bounds with width = 2·range, CENTER alignment);
- the TWO candidates nearest to the label by |center distance| are used
  (x = input bin midpoints, which for center-aligned diff-width bounds are
  the labels themselves);
- fewer than two candidates → QC 129 (QC_OUTSIDE_RANGE|QC_BAD), no value;
- both candidates on the same side → + QC_EXTRAPOLATE (8);
- value = y1 + (y2−y1)/(x2−x1)·(t−x1) (same line extended for
  extrapolation).

Spark-first formulation: the two nearest candidates are always among the
{2 before, 2 after} data samples around the label, so the union-window rank
trick finds them without any interval join: data rows get a per-series
rank; a window over the union counts data rows at-or-before each label;
each label explodes 4 candidate ranks and equi-joins back to the data.
Shuffles: one window exchange + one equi-join on (series, rank) — both on
the same key family, AQE-coalesced; fan-out is a constant 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .bin_average import QC_BAD, QC_EXTRAPOLATE, QC_OUTSIDE_RANGE, _input_bounds_us
from .grid import GridSpec, grid_dataframe


def interpolate_linear(
    df: DataFrame,
    grid: GridSpec,
    series_keys: list[str],
    ts_col: str,
    value_cols: list[str],
    range_s: float,
) -> DataFrame:
    """Interpolate ``value_cols`` onto grid labels (see module docstring).

    ``range_s``: half-width of the candidate window around each label.
    """
    spark = df.sparkSession
    range_us = range_s * 1_000_000.0

    # data rows: rank + center-aligned input bounds (one window scan)
    wo = W.partitionBy(*series_keys).orderBy(ts_col)
    data = _input_bounds_us(df, series_keys, ts_col, grid.interval_us)
    data = data.withColumn("__rank", F.row_number().over(wo)).select(
        *series_keys, "__rank", "__ts_us", "__in_start", "__in_end",
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )

    # label rows: k = number of data samples at-or-before the label
    series = df.select(*series_keys).distinct()
    labels = series.crossJoin(F.broadcast(grid_dataframe(spark, grid))).select(
        *series_keys, "bin_idx",
        F.unix_micros(F.col("label")).cast("double").alias("__t"),
    )
    u = data.select(*series_keys, F.col("__ts_us").alias("__pos"), F.lit(0).alias("__is_grid"),
                    F.lit(None).cast("long").alias("bin_idx"), F.lit(None).cast("double").alias("__t")) \
        .unionByName(labels.select(*series_keys, F.col("__t").alias("__pos"), F.lit(1).alias("__is_grid"),
                                   "bin_idx", "__t"))
    wu = W.partitionBy(*series_keys).orderBy("__pos", "__is_grid").rowsBetween(W.unboundedPreceding, 0)
    u = u.withColumn("__k", F.sum(1 - F.col("__is_grid")).over(wu))
    label_rows = u.where(F.col("__is_grid") == 1)

    # 4 candidate ranks per label → one equi-join
    cand = label_rows.withColumn(
        "__rank",
        F.explode(F.array(F.col("__k") - 1, F.col("__k"), F.col("__k") + 1, F.col("__k") + 2)),
    ).where(F.col("__rank") >= 1)
    joined = cand.join(data, [*series_keys, "__rank"], "inner")

    # candidacy: input bin overlaps [label - range, label + range)
    out_start = F.col("__t") - F.lit(range_us)
    out_end = F.col("__t") + F.lit(range_us)
    joined = joined.where((F.col("__in_end") > out_start) & (F.col("__in_start") < out_end))

    mid = (F.col("__in_start") + F.col("__in_end")) / 2.0
    cstruct = F.struct(
        F.abs(mid - F.col("__t")).alias("adist"),
        mid.alias("x"),
        *[F.col(v).alias(v) for v in value_cols],
    )
    agg = joined.groupBy(*series_keys, "bin_idx", "__t").agg(
        F.slice(F.array_sort(F.collect_list(cstruct)), 1, 2).alias("__near")
    )

    c1 = F.element_at(F.col("__near"), 1)
    c2 = F.element_at(F.col("__near"), 2)
    has2 = F.size(F.col("__near")) >= 2
    t = F.col("__t")
    x1, x2 = c1["x"], c2["x"]
    same_side = ((x1 < t) & (x2 < t)) | ((x1 > t) & (x2 > t))

    # complete the grid so labels with zero candidates still appear
    full = labels.join(agg, [*series_keys, "bin_idx", "__t"], "left")

    out = [*series_keys, F.timestamp_micros(t.cast("long")).alias("label")]
    for v in value_cols:
        y1, y2 = c1[v], c2[v]
        m = (y2 - y1) / (x2 - x1)
        val = (
            F.when((x1 <= t) & (t <= x2), y1 + m * (t - x1))
            .when(t < x1, y1 + m * (t - x1))
            .otherwise(y2 + m * (t - x2))
        )
        out.append(F.when(has2, val).alias(v))
        qc = F.when(~F.coalesce(has2, F.lit(False)), QC_OUTSIDE_RANGE + QC_BAD).otherwise(
            F.when(same_side, QC_EXTRAPOLATE).otherwise(0)
        )
        out.append(qc.cast("int").alias(f"qc_{v}"))
    return full.select(*out)
