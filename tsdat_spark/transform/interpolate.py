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

Spark-first formulation (join-free, round 3): the two nearest candidates
are always among the {2 before-or-at, 2 after} data samples around the
label, and both pairs ride to every label row on running ``last(...,
ignorenulls)`` windows over the data∪labels union — forward for the
before-pair (each data row carries its own struct + its lag), backward for
the after-pair (struct + lead). No interval join, no explode, no
aggregation; see ``interpolate_linear`` for the plan accounting.
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

    Join-free formulation (round 3): the two nearest candidates are always
    among {2 before-or-at, 2 after} the label, so each DATA row carries its
    own sample struct plus its lag (for the forward pass) and its lead (for
    the backward pass); running ``last(..., ignorenulls)`` over the
    data∪labels union — forward for (b1, b2), backward for (a1, a2) —
    delivers all four bracketing candidates straight onto each label row.
    Candidacy filtering, two-nearest selection, and the interpolation math
    are then pure column expressions over a 4-element array. Plan: one
    window over data + two window passes over the union on the SAME
    partitioning — no explode, no equi-join, no aggregation, no
    grid-completion join (the union already contains every label row).
    The previous rank-explode(4)+join+groupBy shape paid ~5 exchanges for
    the same result.
    """
    spark = df.sparkSession
    range_us = range_s * 1_000_000.0

    wo = W.partitionBy(*series_keys).orderBy("__pos")
    data = _input_bounds_us(df, series_keys, ts_col, grid.interval_us)
    cstruct = F.struct(
        ((F.col("__in_start") + F.col("__in_end")) / 2.0).alias("x"),
        F.col("__in_start").alias("s"),
        F.col("__in_end").alias("e"),
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )
    data = (
        data.select(*series_keys, F.col("__ts_us").alias("__pos"), cstruct.alias("__c"))
        .withColumn("__fwd", F.struct(F.col("__c").alias("c"), F.lag("__c").over(wo).alias("p")))
        .withColumn("__bwd", F.struct(F.col("__c").alias("c"), F.lead("__c").over(wo).alias("n")))
        .select(*series_keys, "__pos", F.lit(0).alias("__is_grid"),
                F.lit(None).cast("long").alias("bin_idx"), "__fwd", "__bwd")
    )

    series = df.select(*series_keys).distinct()
    labels = series.crossJoin(F.broadcast(grid_dataframe(spark, grid))).select(
        *series_keys, "bin_idx",
        F.unix_micros(F.col("label")).cast("double").alias("__pos"),
        F.lit(1).alias("__is_grid"),
    )
    u = data.unionByName(labels, allowMissingColumns=True)

    # forward: last data row AT-OR-BEFORE the label (data sorts before the
    # label at equal __pos) + its lag; backward: first data row STRICTLY
    # AFTER (desc __is_grid puts the label first at equal __pos, excluding
    # the tied data row already counted by the forward pass) + its lead.
    wf = W.partitionBy(*series_keys).orderBy("__pos", "__is_grid").rowsBetween(W.unboundedPreceding, 0)
    wb = W.partitionBy(*series_keys).orderBy(F.col("__pos").desc(), F.col("__is_grid").desc()).rowsBetween(W.unboundedPreceding, 0)
    lab = (
        u.withColumn("__b", F.last("__fwd", ignorenulls=True).over(wf))
        .withColumn("__a", F.last("__bwd", ignorenulls=True).over(wb))
        .where(F.col("__is_grid") == 1)
    )

    t = F.col("__pos")
    # candidacy: input bin overlaps [label - range, label + range)
    cands = F.filter(
        F.array(F.col("__b.p"), F.col("__b.c"), F.col("__a.c"), F.col("__a.n")),
        lambda c: c.isNotNull() & (c["e"] > t - F.lit(range_us)) & (c["s"] < t + F.lit(range_us)),
    )

    def _rank_struct(c):
        return F.struct(
            F.abs(c["x"] - t).alias("adist"), c["x"].alias("x"),
            *[c[v].alias(v) for v in value_cols],
        )

    near = F.slice(F.array_sort(F.transform(cands, _rank_struct)), 1, 2)
    lab = lab.withColumn("__near", near)

    c1 = F.element_at(F.col("__near"), 1)
    c2 = F.element_at(F.col("__near"), 2)
    has2 = F.size(F.col("__near")) >= 2
    x1, x2 = c1["x"], c2["x"]
    same_side = ((x1 < t) & (x2 < t)) | ((x1 > t) & (x2 > t))

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
    return lab.select(*out)
