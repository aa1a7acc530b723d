"""Reference plots: M4 downsampling + dependency-free SVG rendering.

The reference's ``hook_plot_dataset`` lifecycle slot
(``tsdat/pipeline/pipelines/ingest_pipeline.py:79-87``) renders matplotlib
figures of the final dataset into ``storage.uploadable_dir()``. On a 100 TB
table "plot the datastream" cannot mean "collect the datastream": the
scale-correct shape is **M4 downsampling** (Jugel, Markl et al., "M4: A
Visualization-Oriented Time Series Data Aggregation", VLDB 2014) — group
points into one bin per horizontal pixel and keep only the first/last/
min/max points of each bin, which provably renders the same pixels as the
full series on a ``width``-pixel canvas. That is ONE ``groupBy`` with
algebraic aggregates (partial-agg/map-side combine, no window, no sort of
the raw data); only the ≤ ``4·width·n_series`` surviving points are
collected to the driver for rendering.

- :func:`m4_downsample` — the Spark operator (oracle-checkable: struct
  min/max arg-extremes use lexicographic struct ordering, identical in
  Spark and ANSI engines).
- :func:`render_timeseries_svg` — pure-text SVG writer (no matplotlib in
  the image; SVG needs no raster libs and diffs deterministically).
- :func:`plot_dataset` — the convenience composition used from the
  ``hook_plot`` slot of :func:`tsdat_spark.pipeline.run_ingest` together
  with :class:`tsdat_spark.io.ancillary.AncillaryStorage`.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _micros(t: str | datetime) -> int:
    if isinstance(t, str):
        t = datetime.fromisoformat(t)
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    return int(t.timestamp() * 1_000_000)


def m4_downsample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    t_start: str | datetime,
    t_stop: str | datetime,
    width: int = 512,
    series_keys: list[str] | None = None,
) -> DataFrame:
    """Per (series, pixel-bin): the first, last, min and max points.

    The pixel domain is the **declared** ``[t_start, t_stop)`` range, not a
    data-derived one — sizing bins from ``min(ts)/max(ts)`` would cost an
    extra full pass over the table before any real work. Points outside the
    range and null values are dropped (both engines agree on that filter;
    null ordering inside struct extremes does not).

    Arg-extremes are extracted through struct min/max — ``min(struct(v,t))``
    is the (value, ts)-lexicographic minimum in Spark AND DuckDB, so ties
    break identically everywhere: first/last tie-break on value, min/max
    tie-break on timestamp. Output timestamps are epoch micros (long).
    """
    t0, t1 = _micros(t_start), _micros(t_stop)
    if t1 <= t0:
        raise ValueError("t_stop must be after t_start")
    keys = list(series_keys or [])
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col).cast("double")
    # floor((t - t0) * width / span); the strict t < t1 filter below keeps
    # every bin in [0, width-1] without a clamp, and (span < ~290
    # years)·width stays within long range.
    b = F.floor(((t - F.lit(t0)) * width) / F.lit(t1 - t0)).cast("int")
    pts = (
        df.where(v.isNotNull() & (t >= t0) & (t < t1))
        .select(*keys, b.alias("bin"), t.alias("t"), v.alias("v"))
    )
    first = F.min(F.struct(F.col("t"), F.col("v")))
    last = F.max(F.struct(F.col("t"), F.col("v")))
    vmin = F.min(F.struct(F.col("v"), F.col("t")))
    vmax = F.max(F.struct(F.col("v"), F.col("t")))
    return pts.groupBy(*keys, "bin").agg(
        first.getField("t").alias("t_first"),
        F.round(first.getField("v"), 6).alias("v_first"),
        F.round(vmin.getField("v"), 6).alias("v_min"),
        vmin.getField("t").alias("t_min"),
        F.round(vmax.getField("v"), 6).alias("v_max"),
        vmax.getField("t").alias("t_max"),
        last.getField("t").alias("t_last"),
        F.round(last.getField("v"), 6).alias("v_last"),
        F.count(F.lit(1)).alias("n_points"),
    )


def _fmt(x: float) -> str:
    return f"{x:.2f}".rstrip("0").rstrip(".")


def render_timeseries_svg(
    rows: list[dict],
    title: str = "",
    width: int = 800,
    height: int = 240,
    series_key: str | None = None,
    margin: int = 36,
) -> str:
    """Render M4 rows (dicts with bin/t_*/v_* fields) to an SVG string.

    Driver-side by design: the input is the *downsampled* point set
    (≤ 4·bins·series rows), never raw data. Each bin contributes its four
    M4 points in time order; bins connect into one polyline per series,
    which is exactly the pixel-faithful rendering the M4 paper proves.
    Pure text output — no raster dependencies, byte-deterministic.
    """
    series: dict[object, list[tuple[int, float]]] = {}
    for r in rows:
        key = r.get(series_key) if series_key else ""
        pts = series.setdefault(key, [])
        seen = set()
        for tf, vf in (("t_first", "v_first"), ("t_min", "v_min"),
                       ("t_max", "v_max"), ("t_last", "v_last")):
            p = (r[tf], r[vf])
            if p not in seen:
                seen.add(p)
                pts.append(p)
    all_pts = [p for pts in series.values() for p in pts]
    if not all_pts:
        body = "<text x='10' y='20'>no data</text>"
        return (f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' "
                f"height='{height}'>{body}</svg>")
    t_lo, t_hi = min(p[0] for p in all_pts), max(p[0] for p in all_pts)
    v_lo, v_hi = min(p[1] for p in all_pts), max(p[1] for p in all_pts)
    t_span = max(t_hi - t_lo, 1)
    v_span = (v_hi - v_lo) or 1.0
    iw, ih = width - 2 * margin, height - 2 * margin

    def sx(t: int) -> float:
        return margin + (t - t_lo) * iw / t_span

    def sy(v: float) -> float:
        return margin + (v_hi - v) * ih / v_span

    palette = ["#1f77b4", "#d62728", "#2ca02c", "#9467bd", "#ff7f0e",
               "#8c564b", "#e377c2", "#7f7f7f"]
    parts = [
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' height='{height}'>",
        f"<rect width='{width}' height='{height}' fill='white'/>",
        f"<rect x='{margin}' y='{margin}' width='{iw}' height='{ih}' "
        "fill='none' stroke='#ccc'/>",
    ]
    if title:
        parts.append(f"<text x='{margin}' y='{margin - 12}' font-size='13' "
                     f"font-family='sans-serif'>{title}</text>")
    for lab, v in ((str(_fmt(v_hi)), v_hi), (str(_fmt(v_lo)), v_lo)):
        parts.append(f"<text x='2' y='{sy(v) + 4:.1f}' font-size='10' "
                     f"font-family='sans-serif'>{lab}</text>")
    for i, (key, pts) in enumerate(sorted(series.items(), key=lambda kv: str(kv[0]))):
        pts.sort()
        color = palette[i % len(palette)]
        coords = " ".join(f"{sx(t):.1f},{sy(v):.1f}" for t, v in pts)
        parts.append(f"<polyline points='{coords}' fill='none' "
                     f"stroke='{color}' stroke-width='1'/>")
        if series_key:
            parts.append(
                f"<text x='{margin + 4}' y='{margin + 14 + 13 * i}' font-size='11' "
                f"font-family='sans-serif' fill='{color}'>{key}</text>")
    parts.append("</svg>")
    return "".join(parts)


def plot_dataset(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    t_start: str | datetime,
    t_stop: str | datetime,
    series_key: str | None = None,
    title: str = "",
    width_px: int = 800,
    bins: int = 256,
) -> str:
    """M4-downsample → collect (bounded) → SVG. The ``hook_plot`` payload."""
    keys = [series_key] if series_key else None
    m4 = m4_downsample(df, ts_col, value_col, t_start, t_stop,
                       width=bins, series_keys=keys)
    rows = [r.asDict() for r in m4.collect()]
    return render_timeseries_svg(rows, title=title, width=width_px,
                                 series_key=series_key)
