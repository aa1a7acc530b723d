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

Spark-first formulation (round 7, guide §2.4): the two nearest candidates
are always among the {2 before-or-at, 2 after} data samples around the
label, i.e. among {lag, cur, lead, lead²} of the data row that is the
label's at-or-before sample — and the grid is REGULAR, so that ownership
is closed-form (``covered_label_range``: row at t with successor t' owns
labels ``k ∈ [⌈(t−g0)/iv⌉, ⌈(t'−g0)/iv⌉−1]``; the first row also owns the
prefix labels with an empty before-pair). ONE window pass over the data
(the same sort already needed for the diff-width input bounds) carries
lag/lead/lead² sample structs; a pure-arithmetic sequence-explode then
emits every label row with all four bracketing candidates attached.
Candidacy filtering, two-nearest selection, and the interpolation math
are pure column expressions over a 4-element array, unchanged from the
round-3 form. The union form this replaces paid the data window PLUS one
exchange and TWO full sorts of the data∪grid union and a
``series.distinct()`` aggregation; this is 1 exchange + 1 sort of the
data alone (plans/r07/interpolate_1h_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .bin_average import QC_BAD, QC_EXTRAPOLATE, QC_OUTSIDE_RANGE, _input_bounds_us
from .grid import GridSpec
from .nearest import covered_label_range


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
    range_us = range_s * 1_000_000.0
    g0, iv = grid.start_us, grid.interval_us

    # both window layers use the SAME (series, ts) spec as _input_bounds_us,
    # so the planner satisfies the second Window's ordering from the first —
    # one exchange, one physical sort
    wo = W.partitionBy(*series_keys).orderBy(ts_col)
    data = _input_bounds_us(df.where(F.col(ts_col).isNotNull()), series_keys, ts_col, grid.interval_us)
    cstruct = F.struct(
        ((F.col("__in_start") + F.col("__in_end")) / 2.0).alias("x"),
        F.col("__in_start").alias("s"),
        F.col("__in_end").alias("e"),
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )
    data = (
        data.select(*series_keys, ts_col, F.col("__ts_us").alias("__pos"), cstruct.alias("__c"))
        .withColumn("__b2", F.lag("__c").over(wo))
        .withColumn("__a1", F.lead("__c").over(wo))
        .withColumn("__a2", F.lead("__c", 2).over(wo))
        .withColumn("__npos", F.lead("__pos").over(wo))
        .drop(ts_col)
        # first row of the series <=> lag(__c) is null (__c itself is a
        # non-null struct) - avoids a third Window operator for row_number
        .withColumn("__first", F.col("__b2").isNull())
    )
    k_lo, k_hi = covered_label_range(
        F.col("__pos").cast("long"), F.col("__npos").cast("long"), F.col("__first"), grid
    )
    ks = F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi)).otherwise(
        F.array().cast("array<long>")
    )
    lab = data.select(
        *series_keys, "__pos", "__c", "__b2", "__a1", "__a2", F.explode(ks).alias("__k")
    )
    t = (F.lit(g0) + F.col("__k") * F.lit(iv)).cast("double")
    # prefix labels (before the first sample): before-pair empty, after-pair
    # = (cur, lead); owned labels: before-pair = (lag, cur), after = (lead, lead²)
    before_row = t < F.col("__pos")
    c1p = F.when(before_row, F.lit(None).cast(data.schema["__c"].dataType)).otherwise(F.col("__b2"))
    c2p = F.when(before_row, F.lit(None).cast(data.schema["__c"].dataType)).otherwise(F.col("__c"))
    c3p = F.when(before_row, F.col("__c")).otherwise(F.col("__a1"))
    c4p = F.when(before_row, F.col("__a1")).otherwise(F.col("__a2"))

    # candidacy: input bin overlaps [label - range, label + range).
    # Two-nearest selection is plain least() over (adist, x, values…) rank
    # structs instead of filter+transform+array_sort+slice: higher-order
    # functions evaluate interpreted per label row, while least()/struct
    # comparisons stay inside whole-stage codegen (round 7, guide §4.1).
    # Ordering is identical to the array_sort it replaces (same struct
    # comparison); ties cannot produce equal structs because x = the
    # sample's midpoint is unique within a series, so the strict `> m1`
    # mask for the second minimum is exact.
    def _rank_struct(c):
        return F.when(
            c.isNotNull() & (c["e"] > t - F.lit(range_us)) & (c["s"] < t + F.lit(range_us)),
            F.struct(
                F.abs(c["x"] - t).alias("adist"), c["x"].alias("x"),
                *[c[v].alias(v) for v in value_cols],
            ),
        )

    s1, s2, s3, s4 = (_rank_struct(c) for c in (c1p, c2p, c3p, c4p))
    m1 = F.least(s1, s2, s3, s4)
    m2 = F.least(*[F.when(s > m1, s) for s in (s1, s2, s3, s4)])
    lab = lab.select(*series_keys, t.alias("__t"), m1.alias("__m1"), m2.alias("__m2"))
    t = F.col("__t")

    c1 = F.col("__m1")
    c2 = F.col("__m2")
    has2 = c2.isNotNull()
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
