"""Quality management: run configured checks per variable, feed handlers.

tsdat's ``QualityManagement.manage`` runs managers sequentially, each
evaluating one checker over selected variables and feeding the boolean mask
to its handlers (``tsdat/qc/base/quality_management.py:16-28``,
``tsdat/qc/base/quality_manager.py:31-50``). Here a manager is declarative
config; the whole run composes into ONE lazy DataFrame program — Catalyst
fuses all scalar checks into the same codegen stage and shares one exchange
across all window checks with identical partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DatasetSpec
from . import checkers, handlers
from .checkers import QCContext


@dataclass
class QCBit:
    """One recorded test: bit number (1-based), meaning, assessment —
    the ACT/ARM flag metadata tsdat stamps on ``qc_<var>``
    (``record_quality_results.py:56-83``)."""

    bit: int
    meaning: str
    assessment: str  # "Bad" | "Indeterminate"

    @property
    def mask(self) -> int:
        return 1 << (self.bit - 1)


@dataclass
class QualityManager:
    """name + checker factory + handler actions for a set of variables.

    ``checker(df, ctx, var, spec) -> Column`` returns the failure mask.
    ``handlers``: ordered list of ("record", assessment) / ("remove",) /
    ("fail", tolerance) / tuples, applied in sequence like tsdat's handler
    list.
    """

    name: str
    checker: Callable[[DataFrame, QCContext, str, DatasetSpec], Column | None]
    apply_to: list[str]
    exclude: list[str] = field(default_factory=list)
    handlers: list[tuple] = field(default_factory=lambda: [("record", "Bad")])


def build_threshold_checker(checker_name: str) -> Callable:
    """Factory for tsdat's 18 concrete threshold checkers by name
    (CheckFailMin, CheckWarnDelta, ...). The threshold comes from the
    variable's declared attrs (``threshold_checker.py:19-29``); a missing
    attribute means the check reports no failures (returns None, like tsdat
    returning None → manager skips)."""
    attribute_name, kind, min_side = checkers.THRESHOLD_CHECKERS[checker_name]

    def _checker(df: DataFrame, ctx: QCContext, var: str, spec: DatasetSpec, allow_equal: bool = True):
        vspec = spec.variables.get(var)
        if vspec is None:
            return None
        th = vspec.threshold(attribute_name, min_=min_side)
        if th is None:
            return None
        col = F.col(var)
        fv = vspec.fill_value
        if kind == "min":
            return checkers.check_min(col, th, allow_equal=allow_equal, fill_value=fv)
        if kind == "max":
            return checkers.check_max(col, th, allow_equal=allow_equal, fill_value=fv)
        if kind == "delta":
            return checkers.check_delta(ctx, col, th, allow_equal=allow_equal, fill_value=fv)
        if kind == "std":
            return checkers.check_std(ctx, col, th, fill_value=fv)
        raise ValueError(kind)

    _checker.__name__ = checker_name
    return _checker


def apply_qc(
    df: DataFrame,
    spec: DatasetSpec,
    ctx: QCContext,
    managers: list[QualityManager],
) -> tuple[DataFrame, dict[str, list[QCBit]]]:
    """Run managers sequentially; returns the transformed DataFrame and the
    per-variable bit registry (for the lineage manifest / flag_meanings)."""
    registry: dict[str, list[QCBit]] = {}
    for mgr in managers:
        for var in mgr.apply_to:
            if var in mgr.exclude:
                continue
            mask = mgr.checker(df, ctx, var, spec)
            if mask is None:
                continue
            for action in mgr.handlers:
                kind = action[0]
                if kind == "record":
                    assessment = action[1] if len(action) > 1 else "Bad"
                    bits = registry.setdefault(var, [])
                    bit = len(bits) + 1
                    bits.append(QCBit(bit, mgr.name, assessment))
                    df = handlers.record_quality_results(df, var, mask, bit)
                elif kind == "remove":
                    is_coord = len(action) > 1 and bool(action[1])
                    df = handlers.remove_failed_values(df, var, mask, is_coordinate=is_coord)
                elif kind == "fail":
                    tolerance = action[1] if len(action) > 1 else 0.0
                    df = handlers.fail_pipeline(df, var, mask, tolerance=tolerance, context=f" [{mgr.name}]")
                elif kind == "sort":
                    df = handlers.sort_by_coordinate(df, list(ctx.order_cols))
                elif kind == "cubic_spline":
                    n_points = action[1] if len(action) > 1 else 12
                    max_gap = action[2] if len(action) > 2 else 6
                    df = handlers.cubic_spline_interp(
                        df, var, mask, list(ctx.series_keys),
                        order_col=ctx.order_cols[-1], n_points=n_points, max_gap=max_gap,
                    )
                else:
                    raise ValueError(f"unknown handler action {kind!r}")
    return df, registry
