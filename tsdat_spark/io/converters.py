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

# strftime directive -> java.time token (the subset tsdat configs use).
# '%%' maps to a literal '%' (valid unquoted in java.time — pattern letters
# are [a-zA-Z] only).
_STRFTIME_TO_JAVA = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "M": "mm", "S": "ss", "f": "SSSSSS", "p": "a", "b": "MMM", "B": "MMMM",
    "j": "DDD", "z": "XX", "%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a Python strptime format (what tsdat configs declare) to
    the java.time pattern Spark's ``to_timestamp`` expects.

    Proper tokenizer (not naive replace): ``%%`` becomes a literal percent
    instead of tripping the unsupported-directive error, and literal runs
    containing letters (e.g. the ``T`` in ``%Y-%m-%dT%H:%M:%S``) are
    single-quoted so java.time reads them as text, not pattern letters."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling '%' at end of strftime format {fmt!r}")
            d = fmt[i + 1]
            if d not in _STRFTIME_TO_JAVA:
                raise ValueError(f"unsupported strftime directive %{d} in {fmt!r}")
            out.append(_STRFTIME_TO_JAVA[d])
            i += 2
        else:
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j]
            if any(c.isalpha() for c in lit) or "'" in lit:
                out.append("'" + lit.replace("'", "''") + "'")
            else:
                out.append(lit)
            i = j
    return "".join(out)


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
