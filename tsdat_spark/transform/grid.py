"""Regular output-grid specification and generation.

tsdat builds output grids with ``create_bounds`` (labels
``arange(start, stop, interval)``, bounds ``[label - align*width,
label - align*width + width)``, last label dropped when it lands on ``stop``
— ``tsdat/transform_v2/utils/create_bounds.py:96-113``). Here the grid is a
*closed form*: only ``n`` is computed on the driver; the rows come from
``spark.range(n)`` so a year of 1-minute labels is still a trivially
parallel scan, never a driver-side array.

All bound arithmetic is done in integer **microseconds** (exact in int64 and
in float64 up to year ~2255), matching Spark timestamp precision.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_epoch_us(t: str | datetime | int | float) -> int:
    if isinstance(t, (int, float)):
        return int(t)
    if isinstance(t, str):
        t = datetime.fromisoformat(t)
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return int(t.timestamp() * 1_000_000)


_ALIGN = {"left": 0.0, "center": 0.5, "right": 1.0}


@dataclass(frozen=True)
class GridSpec:
    """Regular grid: labels ``start + k*interval`` for ``k in [0, n)``,
    bin ``k`` spanning ``[label - alignment*width, ... + width)``."""

    start: str | datetime | int
    stop: str | datetime | int
    interval_s: float
    width_s: float | None = None
    alignment: str | float = "left"

    @property
    def start_us(self) -> int:
        return _to_epoch_us(self.start)

    @property
    def stop_us(self) -> int:
        return _to_epoch_us(self.stop)

    @property
    def interval_us(self) -> int:
        return int(round(self.interval_s * 1_000_000))

    @property
    def width_us(self) -> int:
        w = self.interval_s if self.width_s is None else self.width_s
        return int(round(w * 1_000_000))

    @property
    def align(self) -> float:
        return _ALIGN[self.alignment] if isinstance(self.alignment, str) else float(self.alignment)

    @property
    def offset_us(self) -> int:
        """alignment * width — the label→bin_start shift."""
        return int(round(self.align * self.width_us))

    @property
    def n_bins(self) -> int:
        """Number of labels, replicating create_bounds.py:104-113: arange
        excludes stop; additionally drop the last label when it coincides
        with stop (np.isclose guard for float arange wobble)."""
        span = self.stop_us - self.start_us
        if span <= 0:
            raise ValueError(f"grid start must precede stop: {self.start}..{self.stop}")
        n = math.ceil(span / self.interval_us)
        last = (n - 1) * self.interval_us
        if last >= span:  # arange excludes stop
            n -= 1
            last -= self.interval_us
        return n

    def label_us(self, k):
        """Column expr: epoch-us label of bin k (k may be a Column)."""
        return F.lit(self.start_us) + k.cast("long") * F.lit(self.interval_us)


def grid_dataframe(spark: SparkSession, grid: GridSpec) -> DataFrame:
    """Materialize the grid lazily: (bin_idx, label, bin_start, bin_end).

    ``spark.range`` is a parallel scan — no driver array, no shuffle.
    """
    df = spark.range(grid.n_bins).withColumnRenamed("id", "bin_idx")
    label_us = grid.label_us(F.col("bin_idx"))
    start_us = label_us - F.lit(grid.offset_us)
    return df.select(
        F.col("bin_idx").cast("long"),
        F.timestamp_micros(label_us).alias("label"),
        F.timestamp_micros(start_us).alias("bin_start"),
        F.timestamp_micros(start_us + F.lit(grid.width_us)).alias("bin_end"),
    )
