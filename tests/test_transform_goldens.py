"""Port of tsdat's transform_v2 golden tests to DataFrame assertions.

Sources of truth:
- /root/reference/test/io/test_transform_v2.py:219-307 — 6-point input,
  one Bad-flagged value → expected 30-min bin averages
  [-9999, 0, 1.2, 4.5, -9999] (13:30..15:30, RIGHT-aligned), 60-min
  [-9999, 0, 8/3, -9999] (12:00..15:00, LEFT-aligned), nearest-neighbor
  humidity step series on the 5-min grid (tolerance 900 s, ties → later).
- /root/reference/test/adi/test_transform.py:65-91 — 24 h hourly 2-D input,
  12 h LEFT bins → foo [[5.636364, 5.5], [17.5, 17.5]], qc [[32,0],[0,0]].
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import types as T

from tsdat_spark.transform import GridSpec, bin_average, interpolate_linear, nearest_neighbor
from tsdat_spark.transform.bin_average import VarQC

D = dt.datetime
FILL = -9999.0


@pytest.fixture(scope="module")
def trans_inputs(spark):
    """FIXTURES.md F3: 6 rows at 10-min spacing from 2022-04-13 14:00."""
    schema = T.StructType([
        T.StructField("time", T.TimestampType()),
        T.StructField("temp", T.DoubleType()),
        T.StructField("qc_temp", T.IntegerType()),
        T.StructField("rh", T.DoubleType()),
        T.StructField("qc_rh", T.IntegerType()),
    ])
    rows = [
        (D(2022, 4, 13, 14, 0), 0.0, 0, 59.0, 0),
        (D(2022, 4, 13, 14, 10), 1.0, 0, 60.0, 0),
        (D(2022, 4, 13, 14, 20), 2.0, 0, 61.0, 0),
        (D(2022, 4, 13, 14, 30), None, 1, 62.0, 0),  # -9999 → NULL internally, flagged Bad
        (D(2022, 4, 13, 14, 40), 4.0, 0, 63.0, 0),
        (D(2022, 4, 13, 14, 50), 5.0, 0, 64.0, 0),
    ]
    df = spark.createDataFrame(rows, schema)
    df.persist()
    df.count()
    yield df
    df.unpersist()


def _collect(df, col, lo, hi):
    rows = (
        df.where((df.label >= lo) & (df.label <= hi))
        .orderBy("label")
        .select(col)
        .collect()
    )
    return [FILL if r[0] is None else r[0] for r in rows]


def test_bin_average_30min_golden(trans_inputs):
    grid = GridSpec("2022-04-13", "2022-04-14", interval_s=1800, width_s=1800, alignment="right")
    out = bin_average(
        trans_inputs, grid, series_keys=[], ts_col="time",
        value_cols=["temp"], qc={"temp": VarQC("qc_temp", bad_mask=1)},
        filter_bad_qc=True,
    )
    got = _collect(out, "temp", D(2022, 4, 13, 13, 30), D(2022, 4, 13, 15, 30))
    exp = [FILL, 0.0, 1.2, 4.5, FILL]
    assert got == pytest.approx(exp)


def test_bin_average_60min_golden(trans_inputs):
    grid = GridSpec("2022-04-13", "2022-04-14", interval_s=3600, width_s=3600, alignment="left")
    out = bin_average(
        trans_inputs, grid, series_keys=[], ts_col="time",
        value_cols=["temp"], qc={"temp": VarQC("qc_temp", bad_mask=1)},
        filter_bad_qc=True,
    )
    got = _collect(out, "temp", D(2022, 4, 13, 12, 0), D(2022, 4, 13, 15, 0))
    assert got == pytest.approx([FILL, 0.0, 8 / 3, FILL])


def test_bin_average_qc_bits(trans_inputs):
    grid = GridSpec("2022-04-13", "2022-04-14", interval_s=3600, width_s=3600, alignment="left")
    out = bin_average(
        trans_inputs, grid, series_keys=[], ts_col="time",
        value_cols=["temp"], qc={"temp": VarQC("qc_temp", bad_mask=1)},
        filter_bad_qc=True,
    )
    got = _collect(out, "qc_temp", D(2022, 4, 13, 12, 0), D(2022, 4, 13, 15, 0))
    # 12:00 no inputs → 129; 13:00 one good input → 0; 14:00 has the Bad
    # input → QC_SOME_BAD_INPUTS (32); 15:00 no inputs → 129
    assert got == [129, 0, 32, 129]


def test_nearest_neighbor_golden(trans_inputs):
    grid = GridSpec("2022-04-13", "2022-04-14", interval_s=300, width_s=300, alignment="center")
    out = nearest_neighbor(
        trans_inputs, grid, series_keys=[], ts_col="time",
        value_cols=["rh"], tolerance_s=900,
    )
    got = _collect(out, "rh", D(2022, 4, 13, 13, 40), D(2022, 4, 13, 15, 10))
    exp = [FILL, 59, 59, 59, 59, 60, 60, 61, 61, 62, 62, 63, 63, 64, 64, 64, 64, 64, FILL]
    assert got == pytest.approx(exp)


def test_adi_12h_2d_golden(spark):
    """FIXTURES.md F4: 24 hourly points × 2 levels; foo[4, level0] Bad."""
    rows = []
    for h in range(24):
        for level in range(2):
            bad = h == 4 and level == 0
            rows.append((D(2022, 1, 1, h), level, None if bad else float(h), 1 if bad else 0))
    df = spark.createDataFrame(rows, "time timestamp, level int, foo double, qc_foo int")
    grid = GridSpec("2022-01-01", "2022-01-02", interval_s=12 * 3600, alignment="left")
    out = bin_average(
        df, grid, series_keys=["level"], ts_col="time",
        value_cols=["foo"], qc={"foo": VarQC("qc_foo", bad_mask=1)},
        filter_bad_qc=True, input_alignment="left",
    )
    rows = {(r["level"], r["bin_idx"]): r for r in out.collect()}
    assert rows[(0, 0)]["foo"] == pytest.approx(62 / 11)
    assert rows[(1, 0)]["foo"] == pytest.approx(5.5)
    assert rows[(0, 1)]["foo"] == pytest.approx(17.5)
    assert rows[(1, 1)]["foo"] == pytest.approx(17.5)
    assert rows[(0, 0)]["qc_foo"] == 32
    assert rows[(1, 0)]["qc_foo"] == 0
    assert rows[(0, 1)]["qc_foo"] == 0
    assert rows[(1, 1)]["qc_foo"] == 0


def test_interpolate_linear_basic(spark):
    """Linear interp onto a 5-min grid: interior labels are exact linear
    blends; labels beyond the data ± range are QC 129; labels past the last
    sample but within range extrapolate with bit 8."""
    rows = [(D(2022, 1, 1, 0, 0), 0.0), (D(2022, 1, 1, 0, 10), 10.0), (D(2022, 1, 1, 0, 20), 30.0)]
    df = spark.createDataFrame(rows, "time timestamp, v double")
    grid = GridSpec("2022-01-01 00:00:00", "2022-01-01 01:00:00", interval_s=300)
    out = interpolate_linear(df, grid, [], "time", ["v"], range_s=900)
    got = {r["label"]: (r["v"], r["qc_v"]) for r in out.collect()}
    assert got[D(2022, 1, 1, 0, 5)] == (pytest.approx(5.0), 0)
    assert got[D(2022, 1, 1, 0, 15)] == (pytest.approx(20.0), 0)
    # 00:25/00:30: beyond last sample, within range → extrapolation of the
    # last two points (slope 2/min from (10,10),(20,30))
    assert got[D(2022, 1, 1, 0, 25)] == (pytest.approx(40.0), 8)
    # far beyond range → no candidates → 129
    assert got[D(2022, 1, 1, 0, 55)] == (None, 129)


def test_interpolate_matches_reference_loop(spark):
    """Cross-check interpolate_linear against a literal numpy re-execution
    of the reference algorithm (calculate_linear_interpolation.py:104-172)
    on irregular data."""
    import numpy as np

    rng = np.random.RandomState(42)
    t_us = np.sort(rng.choice(np.arange(0, 3600, 7), size=40, replace=False)) * 1_000_000
    vals = rng.randn(40) * 10
    range_us = 600 * 1_000_000
    interval_us = 120 * 1_000_000
    labels = np.arange(0, 3600 * 1_000_000, interval_us)

    # reference-style single-node evaluation
    widths = np.diff(t_us)
    widths = np.append(widths[0], widths)
    in_start = t_us - widths / 2
    in_end = in_start + widths
    mids = (in_start + in_end) / 2
    exp_val, exp_qc = [], []
    for lab in labels:
        o_start, o_end = lab - range_us, lab + range_us
        cand = np.where((in_end > o_start) & (in_start < o_end))[0]
        if len(cand) < 2:
            exp_val.append(None)
            exp_qc.append(129)
            continue
        d = mids[cand] - lab
        order = np.lexsort((mids[cand], np.abs(d)))[:2]
        i1, i2 = cand[order]
        x1, x2, y1, y2 = mids[i1], mids[i2], vals[i1], vals[i2]
        m = (y2 - y1) / (x2 - x1)
        if min(x1, x2) <= lab <= max(x1, x2):
            y = y1 + m * (lab - x1)
        elif lab < min(x1, x2):
            lo = i1 if x1 < x2 else i2
            y = vals[lo] + m * (lab - mids[lo])
        else:
            hi = i1 if x1 > x2 else i2
            y = vals[hi] + m * (lab - mids[hi])
        qc = 8 if (d[order] < 0).all() or (d[order] > 0).all() else 0
        exp_val.append(y)
        exp_qc.append(qc)

    base = 1_600_000_000_000_000  # arbitrary epoch offset
    rows = [(dt.datetime.utcfromtimestamp((base + int(t)) / 1e6), float(v)) for t, v in zip(t_us, vals)]
    df = spark.createDataFrame(rows, "time timestamp, v double")
    grid = GridSpec(base // 1_000_000 * 1_000_000, base + 3600 * 1_000_000, interval_s=120)
    out = interpolate_linear(df, grid, [], "time", ["v"], range_s=600).orderBy("label").collect()
    assert len(out) == len(labels)
    for r, ev, eq in zip(out, exp_val, exp_qc):
        if ev is None:
            assert r["v"] is None and r["qc_v"] == 129
        else:
            assert r["v"] == pytest.approx(ev), r
            assert r["qc_v"] == eq, r


def test_transform_auto_dispatch(spark):
    """TRANS_AUTO: downsampling grid → bin average (value_avg semantics);
    upsampling grid → interpolation (exact linear blends)."""
    from tsdat_spark.transform import transform_auto

    rows = [(D(2022, 1, 1, 0, 10 * i), float(i) * 10) for i in range(6)]
    df = spark.createDataFrame(rows, "time timestamp, v double")

    # downsample: 30-min grid over 10-min data → averaging path
    down = transform_auto(df, GridSpec("2022-01-01", "2022-01-02", interval_s=1800), [], "time", ["v"])
    assert "v_goodfraction" in down.columns  # bin_average's metric columns
    # upsample: 1-min grid over 10-min data → interpolation path
    up = transform_auto(df, GridSpec("2022-01-01", "2022-01-02", interval_s=60), [], "time", ["v"])
    assert "v_goodfraction" not in up.columns
    got = {r["label"]: r["v"] for r in up.collect()}
    assert got[D(2022, 1, 1, 0, 5)] == pytest.approx(5.0)


def test_transform_passthrough_and_type_registry(spark):
    """TRANS_PASSTHROUGH passes input samples straight through; the registry
    exposes all five declared ADI types (adi_transformation_types.py:1-7)."""
    from tsdat_spark.transform import TRANSFORMATION_TYPES, transform_passthrough

    assert set(TRANSFORMATION_TYPES) == {
        "TRANS_AUTO", "TRANS_BIN_AVERAGE", "TRANS_INTERPOLATE",
        "TRANS_SUBSAMPLE", "TRANS_PASSTHROUGH",
    }
    rows = [("s1", D(2022, 1, 1, 0, 10 * i), float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, time timestamp, v double")
    out = transform_passthrough(df, ["k"], "time", ["v"]).orderBy("label").collect()
    assert [r["v"] for r in out] == [0.0, 1.0, 2.0, 3.0]
    assert [r["label"] for r in out] == [r[1] for r in rows]
