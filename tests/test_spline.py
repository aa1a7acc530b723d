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


REF_SPLINE_CSV = (
    "/root/reference/test/qc/cubic_spline_interp/cubic_spline_interp_test_data.csv"
)


@pytest.mark.skipif(not __import__("os").path.exists(REF_SPLINE_CSV),
                    reason="reference fixture not present")
def test_reference_fixture_golden(spark):
    """The reference's own CubicSplineInterp fixture
    (test_cubic_spline_interp.py:14-27, data file cubic_spline_interp_test_data.csv)
    run through the engine handler with the reference defaults
    (cubic_spline_interp.py:34-37: n_points=12, method=cubic, max_gap=6).

    The reference test masks one random interior point and asserts the
    result differs from the original (it was replaced by interpolation); we
    assert that contract for a deterministic sweep of interior indices, plus
    interior exactness vs the driver-side kernel on a multi-point gap."""
    import pandas as pd

    ref = pd.read_csv(REF_SPLINE_CSV)
    y = ref["col1"].to_numpy(np.float64)
    n = len(y)
    assert n == 256

    rows = [("r", i, float(i), float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, idx int, x double, value double")

    # reference contract: each masked interior point is REPLACED
    for missing_idx in (12, 77, 128, 200, 243):
        out = cubic_spline_interp(
            df, "value", F.col("idx") == missing_idx, ["conv_id"], order_col="x",
            n_points=12, max_gap=6,
        )
        got = {r["idx"]: r["value"] for r in out.collect()}
        assert got[missing_idx] is not None
        assert got[missing_idx] != pytest.approx(y[missing_idx], abs=1e-12)
        # every unmasked value untouched
        untouched = [i for i in range(n) if i != missing_idx]
        assert all(got[i] == pytest.approx(y[i], abs=1e-15) for i in untouched)
        # spark fill == driver kernel fill, exactly
        m = np.zeros(n, bool); m[missing_idx] = True
        exp = cubic_spline_fill(np.arange(n, dtype=float), y, m, n_points=12, max_gap=6)
        assert got[missing_idx] == pytest.approx(exp[missing_idx], abs=1e-12)

    # multi-point interior gap on the reference data: exact kernel parity,
    # and a > max_gap run stays missing
    mask_col = ((F.col("idx") >= 100) & (F.col("idx") <= 104)) | \
               ((F.col("idx") >= 180) & (F.col("idx") <= 187))
    out = cubic_spline_interp(df, "value", mask_col, ["conv_id"], order_col="x",
                              n_points=12, max_gap=6)
    got = {r["idx"]: r["value"] for r in out.collect()}
    m = np.zeros(n, bool); m[100:105] = True; m[180:188] = True
    exp = cubic_spline_fill(np.arange(n, dtype=float), y, m, n_points=12, max_gap=6)
    for i in range(n):
        if np.isnan(exp[i]):
            assert got[i] is None or np.isnan(got[i])
        else:
            assert got[i] == pytest.approx(exp[i], abs=1e-12)
    assert all(got[i] is None or np.isnan(got[i]) for i in range(180, 188))  # 8 > max_gap
    assert all(got[i] is not None and not np.isnan(got[i]) for i in range(100, 105))
