"""QC checkers — boolean failure masks as Catalyst column expressions.

Each factory returns a Spark ``Column`` that evaluates True where the value
FAILS the check, aligned row-per-row with the variable — the relational
equivalent of tsdat's ``QualityChecker.run`` returning an ``NDArray[bool]``
(``tsdat/qc/base/quality_checker.py:17-43``).

tsdat ships 21 checker classes; they collapse to the 7 parameterized
factories below because the Fail/Warn/Valid × Min/Max/Delta/Std/Range
classes differ only in which variable *attribute* supplies the threshold
(``tsdat/qc/checkers/__init__.py:27-49``, each concrete class is ~11 lines
setting ``attribute_name``).

Everything is whole-stage-codegen'd JVM expression work; the only shuffles
are the per-series window scans (delta/monotonic/std), all sharing one hash
partitioning on the series keys so Catalyst plans a single exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, Window as W
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QCContext:
    """Partitioning context for window-based checks: per-series ordering.

    ``series_keys=[]`` reproduces tsdat's single-series semantics (the whole
    table is one series). ``order_cols`` is the time dimension (tsdat
    ``parameters.dim="time"``, ``check_delta.py:20-22``).
    """

    series_keys: tuple[str, ...] = ()
    order_cols: tuple[str, ...] = ("ts",)

    def window(self) -> W:
        return W.partitionBy(*self.series_keys).orderBy(*self.order_cols)

    def whole(self) -> W:
        return W.partitionBy(*self.series_keys)


def _masked(col: Column, fill_value=None) -> Column:
    """NULL out fill values (tsdat masks _FillValue before thresholding,
    ``check_min.py:27-31``)."""
    if fill_value is None:
        return col
    return F.when(col == F.lit(fill_value), F.lit(None)).otherwise(col)


def check_missing(col: Column, fill_value=None, kind: str = "float") -> Column:
    """``isnull | (== _FillValue)``; strings with no fill use ``""``
    (``tsdat/qc/checkers/check_missing.py:16-27``). NaN counts as missing for
    float columns (``kind`` ∈ {"float", "string", "int", "timestamp"} —
    ``isnan`` is only typeable on floating columns)."""
    mask = col.isNull()
    if kind == "float":
        mask = mask | F.isnan(col)
    if fill_value is not None:
        mask = mask | (col == F.lit(fill_value))
    elif kind == "string":
        mask = mask | (col == F.lit(""))
    return F.coalesce(mask, F.lit(False))


def check_min(col: Column, threshold: float, allow_equal: bool = True, fill_value=None) -> Column:
    """Fail where value below threshold (``check_min.py:11-42``).
    ``allow_equal=True`` → strict ``<`` fails; False → ``<=`` fails."""
    c = _masked(col, fill_value)
    mask = (c < F.lit(threshold)) if allow_equal else (c <= F.lit(threshold))
    return F.coalesce(mask, F.lit(False))


def check_max(col: Column, threshold: float, allow_equal: bool = True, fill_value=None) -> Column:
    """Symmetric to :func:`check_min` (``check_max.py:11-42``)."""
    c = _masked(col, fill_value)
    mask = (c > F.lit(threshold)) if allow_equal else (c >= F.lit(threshold))
    return F.coalesce(mask, F.lit(False))


def check_delta(
    ctx: QCContext, col: Column, threshold: float, allow_equal: bool = True, fill_value=None
) -> Column:
    """Fail where |value - previous value| exceeds threshold; the first
    element never fails (tsdat diffs with the first value prepended,
    ``check_delta.py:41-48``)."""
    c = _masked(col, fill_value)
    w = ctx.window()
    prev = F.lag(c).over(w)
    diff = F.abs(c - F.coalesce(prev, c))  # first row diffs against itself → 0
    mask = (diff > F.lit(threshold)) if allow_equal else (diff >= F.lit(threshold))
    return F.coalesce(mask, F.lit(False))


def check_std(ctx: QCContext, col: Column, n_std: float, fill_value=None) -> Column:
    """Fail where value > mean + stddev_samp * n over the series — upper
    side only, a faithful tsdat quirk (``check_std.py:38-42``)."""
    c = _masked(col, fill_value)
    w = ctx.whole()
    mask = c > (F.avg(c).over(w) + F.stddev_samp(c).over(w) * F.lit(n_std))
    return F.coalesce(mask, F.lit(False))


def check_monotonic(
    ctx: QCContext, col: Column, direction: str = "auto", fill_value=None
) -> Column:
    """Fail every value that breaks strict monotonic order **vs the last
    accepted value** (``check_monotonic.py:86-94``: ``prev`` updates only on
    success).

    Equivalence used here (proved in tests): because a failed value never
    exceeds the accepted running extreme, "compare vs last accepted" equals
    "compare vs the running max (increasing) / min (decreasing) of ALL
    preceding values" — which is a plain window aggregate, no iterative scan.

    ``direction='auto'`` reproduces the majority-sign vote on consecutive
    diffs (``check_monotonic.py:78-83``): increasing iff
    ``#(diff>0) >= #(diff<0)`` over the series.
    """
    c = _masked(col, fill_value)
    w = ctx.window()
    prefix = w.rowsBetween(W.unboundedPreceding, -1)
    run_max = F.max(c).over(prefix)
    run_min = F.min(c).over(prefix)
    # NULL/NaN values fail (reference: `nan > prev` is False → flagged),
    # except on the very first row, which never fails.
    not_first = F.count(F.lit(1)).over(prefix) > 0
    null_fail = c.isNull() & not_first
    fail_inc = null_fail | F.coalesce(c <= run_max, F.lit(False))
    fail_dec = null_fail | F.coalesce(c >= run_min, F.lit(False))

    if direction == "increasing":
        return fail_inc
    if direction == "decreasing":
        return fail_dec

    prev = F.lag(c).over(w)
    up = F.when(c > prev, 1).otherwise(0)
    down = F.when(c < prev, 1).otherwise(0)
    whole = ctx.whole()
    increasing = F.sum(up).over(whole) >= F.sum(down).over(whole)
    return F.when(increasing, fail_inc).otherwise(fail_dec)


def check_mask_threshold(col: Column, threshold: float, comparator: str) -> Column:
    """Configurable-comparator scalar check
    (``tsdat/qc/checkers/check_array_mask_threshold.py:18-78``)."""
    ops = {
        "<": col < threshold,
        "<=": col <= threshold,
        ">": col > threshold,
        ">=": col >= threshold,
        "==": col == threshold,
        "!=": col != threshold,
    }
    return F.coalesce(ops[comparator], F.lit(False))


# ---------------------------------------------------------------------------
# tsdat's 18 concrete threshold checkers: (attribute_name, factory, kwargs).
# Fail/Warn/Valid variants share semantics and differ only in the attribute
# read and the assessment recorded by the handler.
# ---------------------------------------------------------------------------
THRESHOLD_CHECKERS: dict[str, tuple[str, str, bool]] = {
    # name -> (attribute_name, kind, min_side)
    **{f"Check{a}Min": (f"{a.lower()}_min", "min", True) for a in ("Fail", "Warn", "Valid")},
    **{f"Check{a}Max": (f"{a.lower()}_max", "max", False) for a in ("Fail", "Warn", "Valid")},
    **{f"Check{a}RangeMin": (f"{a.lower()}_range", "min", True) for a in ("Fail", "Warn", "Valid")},
    **{f"Check{a}RangeMax": (f"{a.lower()}_range", "max", False) for a in ("Fail", "Warn", "Valid")},
    **{f"Check{a}Delta": (f"{a.lower()}_delta", "delta", False) for a in ("Fail", "Warn", "Valid")},
    **{f"Check{a}Std": (f"{a.lower()}_std", "std", False) for a in ("Fail", "Warn", "Valid")},
}
