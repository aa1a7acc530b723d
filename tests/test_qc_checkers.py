"""Port of tsdat's QC checker golden tests to DataFrame assertions.

Source of truth: /root/reference/test/qc/test_checkers.py:32-84 (31
parameterized cases) over the 4-point fixture at
/root/reference/test/qc/fixtures/sample_dataset.py:7-58. Expected masks are
copied verbatim; the fixture becomes a 4-row single-series DataFrame.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsdat_spark.config import DatasetSpec, VariableSpec
from tsdat_spark.qc import QCContext, check_missing, check_monotonic
from tsdat_spark.qc.manager import build_threshold_checker

TIMES = [dt.datetime(2022, 4, 13, 14, 10) + dt.timedelta(minutes=10 * i) for i in range(4)]

MONO_ATTRS = {
    "valid_min": 60, "fail_min": 60, "warn_min": 60,
    "valid_max": 61, "fail_max": 61, "warn_max": 61,
    "valid_range": [60, 61], "fail_range": [60, 61], "warn_range": [60, 61],
    "valid_delta": 2, "fail_delta": 2, "warn_delta": 2,
    "valid_std": 6, "fail_std": 5, "warn_std": 1,
}


def spec() -> DatasetSpec:
    return DatasetSpec(
        name="qc_sample",
        ts_col="time",
        variables={
            "missing_var": VariableSpec("missing_var", "double", fill_value=-9999.0),
            "monotonic_var": VariableSpec("monotonic_var", "double", fill_value=-9999.0, attrs=MONO_ATTRS),
            "other_var": VariableSpec("other_var", "double"),
            "other_var_r": VariableSpec("other_var_r", "double"),
            "string_var": VariableSpec("string_var", "string"),
        },
    )


@pytest.fixture(scope="module")
def sample_df(spark):
    schema = T.StructType([
        T.StructField("time", T.TimestampType()),
        T.StructField("missing_var", T.DoubleType()),
        T.StructField("monotonic_var", T.DoubleType()),
        T.StructField("other_var", T.DoubleType()),
        T.StructField("other_var_r", T.DoubleType()),
        T.StructField("string_var", T.StringType()),
    ])
    rows = [
        (TIMES[0], -9999.0, 59.0, 59.0, 58.0, "foo"),
        (TIMES[1], math.nan, 60.0, 60.0, 61.0, ""),
        (TIMES[2], 61.0, 61.0, 61.0, 60.0, ""),
        (TIMES[3], 62.0, 64.0, 58.0, 59.0, "bar"),
    ]
    df = spark.createDataFrame(rows, schema)
    df.persist()
    df.count()
    yield df
    df.unpersist()


CTX = QCContext(series_keys=(), order_cols=("time",))


def run_mask(df, mask_col):
    rows = df.withColumn("__m", mask_col).orderBy("time").select("__m").collect()
    return [bool(r[0]) for r in rows]


# (checker_name, kwargs, var, expected) — verbatim from test_checkers.py:35-66
THRESHOLD_CASES = [
    ("CheckFailDelta", {}, "monotonic_var", [False, False, False, True]),
    ("CheckFailMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckFailMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckFailRangeMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckFailRangeMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckFailStd", {}, "monotonic_var", [False, False, False, False]),
    ("CheckValidDelta", {"allow_equal": False}, "monotonic_var", [False, False, False, True]),
    ("CheckValidMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckValidMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckValidRangeMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckValidRangeMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckValidStd", {}, "monotonic_var", [False, False, False, False]),
    ("CheckWarnDelta", {}, "monotonic_var", [False, False, False, True]),
    ("CheckWarnMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckWarnMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckWarnRangeMax", {"allow_equal": False}, "monotonic_var", [False, False, True, True]),
    ("CheckWarnRangeMin", {}, "monotonic_var", [True, False, False, False]),
    ("CheckWarnStd", {}, "monotonic_var", [False, False, False, True]),
]


@pytest.mark.parametrize("checker_name,kwargs,var,expected", THRESHOLD_CASES)
def test_threshold_checkers(sample_df, checker_name, kwargs, var, expected):
    checker = build_threshold_checker(checker_name)
    mask = checker(sample_df, CTX, var, spec(), **kwargs)
    assert mask is not None
    assert run_mask(sample_df, mask) == expected


def test_threshold_checker_missing_attribute_returns_none(sample_df):
    checker = build_threshold_checker("CheckFailMin")
    assert checker(sample_df, CTX, "other_var", spec()) is None


MISSING_CASES = [
    ("missing_var", -9999.0, "float", [True, True, False, False]),
    ("string_var", None, "string", [False, True, True, False]),
    ("time", None, "timestamp", [False, False, False, False]),
]


@pytest.mark.parametrize("var,fill,kind,expected", MISSING_CASES)
def test_check_missing(sample_df, var, fill, kind, expected):
    mask = check_missing(F.col(var), fill_value=fill, kind=kind)
    assert run_mask(sample_df, mask) == expected


MONOTONIC_CASES = [
    ("time", "auto", [False, False, False, False]),
    ("monotonic_var", "auto", [False, False, False, False]),
    ("other_var", "auto", [False, False, False, True]),
    ("other_var_r", "auto", [False, True, True, True]),
    ("time", "decreasing", [False, True, True, True]),
    ("time", "increasing", [False, False, False, False]),
]


@pytest.mark.parametrize("var,direction,expected", MONOTONIC_CASES)
def test_check_monotonic(sample_df, var, direction, expected):
    mask = check_monotonic(CTX, F.col(var), direction=direction)
    assert run_mask(sample_df, mask) == expected


def test_monotonic_running_extreme_equals_last_accepted():
    """Prove the window-aggregate formulation equals tsdat's 'prev updates
    only on success' scan (check_monotonic.py:86-94) on adversarial data."""
    import random

    rng = random.Random(42)
    for _ in range(200):
        values = [rng.randint(0, 20) for _ in range(rng.randint(1, 30))]
        for direction in ("increasing", "decreasing"):
            # reference scan
            prev = values[0]
            ref = [False] * len(values)
            for i, v in enumerate(values[1:]):
                ok = v < prev if direction == "decreasing" else v > prev
                if ok:
                    prev = v
                else:
                    ref[i + 1] = True
            # running-extreme formulation
            got = [False] * len(values)
            for i in range(1, len(values)):
                ext = max(values[:i]) if direction == "increasing" else min(values[:i])
                got[i] = values[i] <= ext if direction == "increasing" else values[i] >= ext
            assert got == ref, (values, direction)
