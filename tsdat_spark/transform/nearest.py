"""Nearest-neighbor regridding (as-of both directions with tolerance).

Reference semantics: ``xr.reindex_like(method="nearest", tolerance=range)``
(``tsdat/transform_v2/nearest_neighbor/calculate_nearest_neighbor.py:8-41``),
golden behavior in ``test/io/test_transform_v2.py:275-305`` — ties between
the earlier and later sample resolve to the **later** one, tolerance is
inclusive.

Spark-first formulation (round 7, guide §2.4 — remove shuffles outright):
for every output label only the nearest at-or-before and strictly-after
samples matter, and the grid is REGULAR, so each data row knows *which*
labels it is the at-or-before sample for in closed form:
row at t with successor at t' covers labels ``g0 + k·iv`` for
``k ∈ [⌈(t−g0)/iv⌉, ⌈(t'−g0)/iv⌉ − 1]`` (the first row additionally owns
the prefix labels before it, with prev = NULL). One window pass over the
DATA rows (a single ``lead``) followed by a pure-arithmetic
sequence-explode emits every label row with both bracketing samples
attached — no data∪grid union, no second reversed sort, no
``series.distinct()`` pass, no grid cross-join. The previous union form
paid 1 exchange + 2 full sorts of data+grid and a distinct aggregation;
this is 1 exchange + 1 sort of the data alone (plans/r07/nearest_1h_*).

Tie semantics are unchanged: a label at exactly a sample time lands in
that sample's own range (⌈·⌉ boundary), so prev = the tied sample with
distance 0, and equidistant prev/next still resolve to next via the same
``d_next <= d_prev`` pick the union form used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .bin_average import QC_BAD, QC_OUTSIDE_RANGE
from .grid import GridSpec


def _floor_div(x: Column, d: int) -> Column:
    """Exact floor division of a long column by a positive int literal
    (``pmod`` is the floor-modulus, so the difference is an exact multiple;
    the double division is exact for |x| < 2^53)."""
    return ((x - F.pmod(x, F.lit(d))) / F.lit(d)).cast("long")


def _ceil_div(x: Column, d: int) -> Column:
    return _floor_div(x + F.lit(d - 1), d)


def covered_label_range(
    t_us: Column, next_us: Column, is_first: Column, grid: GridSpec
) -> tuple[Column, Column]:
    """(k_lo, k_hi) of the grid labels whose at-or-before sample is this
    row — [⌈(t−g0)/iv⌉, ⌈(t'−g0)/iv⌉−1] clamped to [0, n), the first row
    extended to 0 (prefix labels, prev=NULL) and the last to n−1."""
    g0, iv, n = grid.start_us, grid.interval_us, grid.n_bins
    k_lo = F.when(is_first, F.lit(0).cast("long")).otherwise(
        F.greatest(_ceil_div(t_us - F.lit(g0), iv), F.lit(0).cast("long"))
    )
    k_hi = F.when(next_us.isNull(), F.lit(n - 1).cast("long")).otherwise(
        F.least(_ceil_div(next_us - F.lit(g0), iv) - 1, F.lit(n - 1).cast("long"))
    )
    return k_lo, k_hi


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
    tol_us = tolerance_s * 1_000_000.0
    g0, iv = grid.start_us, grid.interval_us

    payload = F.struct(
        F.unix_micros(F.col(ts_col)).cast("double").alias("ts_us"),
        *[F.col(v).cast("double").alias(v) for v in value_cols],
    )
    data = df.where(F.col(ts_col).isNotNull()).select(
        *series_keys, F.unix_micros(F.col(ts_col)).alias("__t"), payload.alias("__p")
    )
    w = W.partitionBy(*series_keys).orderBy("__t")
    data = (
        data.withColumn("__nt", F.lead("__t").over(w))
        .withColumn("__np", F.lead("__p").over(w))
        .withColumn("__first", F.row_number().over(w) == 1)
    )
    k_lo, k_hi = covered_label_range(F.col("__t"), F.col("__nt"), F.col("__first"), grid)
    ks = F.when(k_lo <= k_hi, F.sequence(k_lo, k_hi)).otherwise(
        F.array().cast("array<long>")
    )
    lab = data.select(
        *series_keys, "__t", "__p", "__np", F.explode(ks).alias("__k")
    )
    pos = (F.lit(g0) + F.col("__k") * F.lit(iv)).cast("long")
    # prefix labels (before the first sample) have prev = NULL and the row
    # itself as the strictly-after sample
    before_row = pos < F.col("__t")
    prev = F.when(before_row, F.lit(None).cast(data.schema["__p"].dataType)).otherwise(
        F.col("__p")
    )
    nxt = F.when(before_row, F.col("__p")).otherwise(F.col("__np"))
    lab = lab.select(
        *series_keys, pos.cast("double").alias("__pos"),
        prev.alias("__prev"), nxt.alias("__next"),
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
    return lab.select(*out)
