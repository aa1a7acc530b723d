"""CubicSplineInterp handler (cubic_spline_interp.py:9-53 semantics):
bounded-gap natural-cubic fill per series, mapInPandas batch path equals
the driver-side numpy kernel exactly."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdat_spark.qc import cubic_spline_fill, cubic_spline_interp


@pytest.fixture(scope="module")
def series_df(spark):
    rows = []
    for conv in ("c1", "c2"):
        phase = 0.0 if conv == "c1" else 1.3
        for i in range(80):
            rows.append((conv, i, float(i), math.sin(i / 9.0 + phase)))
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, x double, value double")


def test_spline_fill_matches_driver_kernel(spark, series_df):
    # mask: a 3-wide interior gap per series + one 10-wide gap (> max_gap)
    mask = F.col("turn_idx").isin(40, 41, 42) | ((F.col("turn_idx") >= 60) & (F.col("turn_idx") < 70))
    out = cubic_spline_interp(
        series_df, "value", mask, ["conv_id"], order_col="x", n_points=12, max_gap=6
    )
    got = {(r["conv_id"], r["turn_idx"]): r["value"] for r in out.collect()}
    assert len(got) == 160

    for conv, phase in (("c1", 0.0), ("c2", 1.3)):
        x = np.arange(80, dtype=float)
        y = np.sin(x / 9.0 + phase)
        m = np.zeros(80, bool)
        m[[40, 41, 42]] = True
        m[60:70] = True
        expected = cubic_spline_fill(x, y, m, n_points=12, max_gap=6)
        for i in range(80):
            g = got[(conv, i)]
            if np.isnan(expected[i]):
                assert g is None or np.isnan(g)  # long gap stays missing
            else:
                assert g == pytest.approx(expected[i], abs=1e-12)
        # the short gap really got filled, and accurately (smooth series)
        assert abs(expected[41] - y[41]) < 1e-3
        assert np.isnan(expected[65])


def test_spline_preserves_unmasked_and_schema(spark, series_df):
    out = cubic_spline_interp(series_df, "value", F.lit(False), ["conv_id"], order_col="x")
    assert out.columns == series_df.columns
    assert out.count() == series_df.count()
    orig = series_df.agg(F.sum("value")).first()[0]
    after = out.agg(F.sum("value")).first()[0]
    assert after == pytest.approx(orig, rel=1e-12)
