"""Retrieval-time data converters — Column-expression analogs of tsdat's
``DataConverter`` classes (``tsdat/io/base/data_converter.py``).

tsdat converters transform a retrieved variable eagerly (numpy/pandas) before
standardization. Here each converter is a factory returning a function
``Column -> Column`` so the whole retrieval stays one lazy Catalyst program:

- :class:`StringToDatetime` — ``string_to_datetime.py:49-88``: explicit
  strptime format (or bare cast when absent) + timezone→UTC normalization,
  mapped to ``F.to_timestamp`` / ``F.to_utc_timestamp``.
- :class:`UnitsConverter` — ``units_converter.py:30-114``: the pint lookup
  happens ON THE DRIVER via :mod:`tsdat_spark.units`, and the data path is
  the pure affine expression ``col * scale + offset`` (codegen'd; no Python
  per row). Matches tsdat's short-circuits: missing/"1" units → unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..units import UnitsError, conversion

# strftime -> java.time format tokens (the subset tsdat configs use).
# Ordered: longer/stricter tokens first so replacement is unambiguous.
_STRFTIME_TO_JAVA = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%I", "hh"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%p", "a"),
    ("%b", "MMM"),
    ("%B", "MMMM"),
    ("%j", "DDD"),
    ("%z", "XX"),
    ("%%", "%"),
]


def strftime_to_java(fmt: str) -> str:
    """Translate a Python strptime format (what tsdat configs declare) to
    the java.time pattern Spark's ``to_timestamp`` expects."""
    out = fmt
    for py, java in _STRFTIME_TO_JAVA:
        out = out.replace(py, java)
    if "%" in out:
        raise ValueError(f"unsupported strftime directive in {fmt!r} -> {out!r}")
    return out


@dataclass(frozen=True)
class StringToDatetime:
    """``format``: strptime pattern (None → plain cast, like pandas
    guessing); ``timezone``: IANA zone the input is reported in — data is
    converted to UTC (the engine's canonical zone), mirroring
    ``string_to_datetime.py:63-68``."""

    format: str | None = None
    timezone: str | None = None

    def __call__(self, col: Column) -> Column:
        if self.format:
            ts = F.to_timestamp(col, strftime_to_java(self.format))
        else:
            ts = col.cast("timestamp")
        if self.timezone and self.timezone != "UTC":
            # input wall-clock is in self.timezone; shift to UTC instants.
            # (session zone is pinned UTC, so timestamps render as UTC.)
            ts = F.to_utc_timestamp(ts, self.timezone)
        return ts


@dataclass(frozen=True)
class UnitsConverter:
    """``input_units``: units of the raw column (tsdat falls back to the
    input attrs; a relational input has no attrs, so it must be declared).
    ``output_units``: the dataset-declared target units."""

    input_units: str | None = None
    output_units: str | None = None

    def __call__(self, col: Column) -> Column:
        iu, ou = self.input_units, self.output_units
        # tsdat short-circuits: unknown/dimensionless/equal units → unchanged
        # (units_converter.py:46-56)
        if not iu or not ou or iu == ou or iu == "1" or ou == "1":
            return col
        scale, offset = conversion(iu, ou)  # raises UnitsError if unmappable
        if scale == 1.0 and offset == 0.0:
            return col
        return col * F.lit(scale) + F.lit(offset)


__all__ = ["StringToDatetime", "UnitsConverter", "UnitsError", "strftime_to_java"]
