"""Overlap-weighted bin average with tsdat transform_v2 semantics.

Normative reference (studied, not ported):
``tsdat/transform_v2/bin_average/calculate_bin_average.py:15-111`` with
weights from ``tsdat/transform_v2/utils/get_bound_overlaps.py:51-92``
(weight = overlap_length / input_bin_length), average/std from
``_weighted_average.py:4-19`` / ``_weighted_std.py:4-26`` and QC bits from
``_perform_bin_average_qc_checks.py:46-77``.

Spark-first design — how this differs from the reference's O(n·m) overlap
matrix + per-output-bin Python loop:

1. **Input bounds** are derived per series with one window scan
   (center-aligned bounds from labels, width = diff(labels) with the first
   diff duplicated — ``create_bounds.py:116-175``).
2. **Candidate output bins** for each input row are generated *arithmetically*
   (regular grid ⇒ an input bin [a,b) can only overlap bins with index in
   [⌊(a−G+αW−W)/I⌋, ⌈(b−G+αW)/I⌉]) and exploded — a bounded fan-out of
   ~⌈(width+W)/I⌉ rows per input, never a join, never an n×m matrix.
3. **One shuffle**: groupBy (series, bin) computes all weighted moments and
   QC counters as algebraic (partially aggregable, map-side combined)
   sums. std uses the algebraic identity √(Σwx²/Σw − avg²) — equal to the
   reference's √(Σw(x−avg)²/Σw) and single-pass.
4. **Grid completion** joins the aggregate against the full (series × bin)
   frame — the broadcast grid is a `spark.range`, so empty bins (QC 129)
   appear without any driver-side work.

At 100 TB: the groupBy key (series, bin) has bounded cardinality per
partition, the candidate fan-out is constant, and everything before the
single exchange is whole-stage-codegen'd column math.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .grid import GridSpec, grid_dataframe

# Transform QC flags (ADI/tsdat layout, add_empty_transform_qc_var.py:26-56)
QC_BAD = 1
QC_INDETERMINATE = 2
QC_INTERPOLATE = 4
QC_EXTRAPOLATE = 8
QC_NOT_USING_CLOSEST = 16
QC_SOME_BAD_INPUTS = 32
QC_ZERO_WEIGHT = 64
QC_OUTSIDE_RANGE = 128
QC_ALL_BAD_INPUTS = 256
QC_BAD_STD = 512
QC_INDETERMINATE_STD = 1024
QC_BAD_GOODFRAC = 2048
QC_INDETERMINATE_GOODFRAC = 4096

GOODFRAC_IND_MIN = 0.15
GOODFRAC_BAD_MIN = 0.05


@dataclass(frozen=True)
class VarQC:
    """QC companion wiring for one transformed variable: which column holds
    the bit-packed flags and which bits mean Bad / Indeterminate."""

    qc_col: str | None = None
    bad_mask: int = 0xFFFFFFFF  # default: any set bit is Bad (tsdat flag 1)
    ind_mask: int = 0


_IN_ALIGN = {"left": 0.0, "center": 0.5, "right": 1.0}


def _input_bounds_us(
    df: DataFrame,
    series_keys: list[str],
    ts_col: str,
    fallback_width_us: int,
    alignment: str | float = "center",
):
    """Input bounds inferred from labels (``create_bounds_from_labels``:
    width = diff(labels) with the first diff duplicated; tsdat infers
    CENTER alignment when no stored bounds exist — ``calculate_bin_average
    .py:57-60`` — but stored bounds may be e.g. LEFT-aligned, hence the
    ``alignment`` knob). Adds __ts_us/__in_start/__in_end (double epoch-us).
    One window scan."""
    a = _IN_ALIGN[alignment] if isinstance(alignment, str) else float(alignment)
    w = W.partitionBy(*series_keys).orderBy(ts_col)
    ts_us = F.unix_micros(F.col(ts_col)).cast("double")
    prev = F.lag(ts_us).over(w)
    nxt = F.lead(ts_us).over(w)
    width = F.coalesce(ts_us - prev, nxt - ts_us, F.lit(float(fallback_width_us)))
    start = ts_us - width * a
    return (
        df.withColumn("__ts_us", ts_us)
        .withColumn("__in_start", start)
        .withColumn("__in_end", start + width)
    )


def explode_candidate_bins(df: DataFrame, grid: GridSpec) -> DataFrame:
    """Attach (bin_idx, weight) to every input row via arithmetic candidate
    generation + exact overlap filter. Requires __in_start/__in_end."""
    g0 = float(grid.start_us)
    interval = float(grid.interval_us)
    width = float(grid.width_us)
    off = float(grid.offset_us)
    n = grid.n_bins

    j_lo = F.greatest(F.floor((F.col("__in_start") - g0 + off - width) / interval), F.lit(0))
    j_hi = F.least(F.ceil((F.col("__in_end") - g0 + off) / interval), F.lit(n - 1))
    candidates = F.when(j_lo <= j_hi, F.sequence(j_lo.cast("long"), j_hi.cast("long"))).otherwise(
        F.array().cast("array<long>")
    )
    df = df.withColumn("bin_idx", F.explode(candidates))

    bin_start = F.lit(g0) + F.col("bin_idx") * interval - off
    bin_end = bin_start + width
    overlap = F.least(F.col("__in_end"), bin_end) - F.greatest(F.col("__in_start"), bin_start)
    in_len = F.col("__in_end") - F.col("__in_start")
    weight = overlap / in_len
    return df.where((F.col("__in_end") > F.col("__in_start")) & (overlap > 0)).withColumn(
        "__weight", weight
    )


def bin_average(
    df: DataFrame,
    grid: GridSpec,
    series_keys: list[str],
    ts_col: str,
    value_cols: list[str],
    qc: dict[str, VarQC] | None = None,
    filter_bad_qc: bool = False,
    add_metrics: bool = True,
    complete_grid: bool = True,
    input_alignment: str | float = "center",
) -> DataFrame:
    """Weighted bin average of ``value_cols`` onto ``grid`` per series.

    Output: one row per (series, bin) with label/bin_start/bin_end and, per
    variable v: ``v`` (weighted avg, NULL when undefined), ``v_std``,
    ``v_goodfraction``, ``qc_v`` (transform QC bits).
    """
    qc = qc or {}
    spark = df.sparkSession
    # capture the full series frame BEFORE the overlap filter, so a series
    # with zero in-grid samples still gets its (empty, QC 129) bins
    all_series = df.select(*series_keys).distinct() if series_keys else None

    df = _input_bounds_us(df, series_keys, ts_col, grid.interval_us, input_alignment)
    df = explode_candidate_bins(df, grid)

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n"), F.sum("__weight").alias("__sum_raw_w")]
    for v in value_cols:
        cfg = qc.get(v, VarQC())
        col = F.col(v).cast("double")
        if cfg.qc_col is not None:
            qc_bits = F.coalesce(F.col(cfg.qc_col).cast("long"), F.lit(0))
            bad = (qc_bits.bitwiseAND(F.lit(cfg.bad_mask)) != 0) | col.isNull()
            ind = qc_bits.bitwiseAND(F.lit(cfg.ind_mask)) != 0
        else:
            bad = col.isNull()
            ind = F.lit(False)
        x = F.when(bad, F.lit(None)).otherwise(col) if filter_bad_qc else col
        xw = F.when(x.isNotNull(), F.col("__weight"))  # NaN-weight trick, vectorized
        aggs += [
            F.sum(xw).alias(f"__sw_{v}"),
            F.sum(xw * x).alias(f"__swx_{v}"),
            F.sum(xw * x * x).alias(f"__swx2_{v}"),
            F.sum(bad.cast("long")).alias(f"__nbad_{v}"),
            F.sum(ind.cast("long")).alias(f"__nind_{v}"),
            F.sum(xw * (1 - bad.cast("double"))).alias(f"__good_{v}"),
        ]

    agg = df.groupBy(*series_keys, "bin_idx").agg(*aggs)

    if complete_grid and all_series is not None:
        frame = all_series.crossJoin(F.broadcast(grid_dataframe(spark, grid)))
        agg = frame.join(agg, [*series_keys, "bin_idx"], "left")
    elif complete_grid:
        agg = grid_dataframe(spark, grid).join(agg, "bin_idx", "left")
    else:
        g = grid_dataframe(spark, grid)
        agg = agg.join(F.broadcast(g), "bin_idx", "left")

    out_cols: list[Column] = [*[F.col(k) for k in series_keys], "bin_idx", "label", "bin_start", "bin_end"]
    empty_bin = F.col("__n").isNull()
    for v in value_cols:
        sw, swx, swx2 = F.col(f"__sw_{v}"), F.col(f"__swx_{v}"), F.col(f"__swx2_{v}")
        nbad, nind, good = F.col(f"__nbad_{v}"), F.col(f"__nind_{v}"), F.col(f"__good_{v}")
        n = F.col("__n")

        avg = F.when(sw > 0, swx / sw)
        out_cols.append(avg.alias(v))

        if add_metrics:
            std = F.when(sw > 0, F.sqrt(F.greatest(swx2 / sw - (swx / sw) * (swx / sw), F.lit(0.0))))
            goodfrac = F.when(sw > 0, good / sw)
            badfrac = nbad.cast("double") / n.cast("double")
            goodfrac_qc = F.lit(1.0) - badfrac  # unweighted mean of ~bad
            bits = (
                F.when(nind > 0, QC_INDETERMINATE).otherwise(0)
                + F.when((nbad > 0) & (nbad < n), QC_SOME_BAD_INPUTS).otherwise(0)
                + F.when(F.coalesce(F.col("__sum_raw_w"), F.lit(0.0)) == 0, QC_ZERO_WEIGHT).otherwise(0)
                + F.when(nbad == n, QC_ALL_BAD_INPUTS + QC_BAD).otherwise(0)
                + F.when(goodfrac_qc < GOODFRAC_BAD_MIN, QC_BAD_GOODFRAC).otherwise(0)
                + F.when(goodfrac_qc < GOODFRAC_IND_MIN, QC_INDETERMINATE_GOODFRAC).otherwise(0)
            )
            qc_col = F.when(empty_bin, QC_OUTSIDE_RANGE + QC_BAD).otherwise(bits).cast("int")
            out_cols += [
                std.alias(f"{v}_std"),
                goodfrac.alias(f"{v}_goodfraction"),
                qc_col.alias(f"qc_{v}"),
            ]

    return agg.select(*out_cols)
