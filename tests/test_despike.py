"""Goring-Nikora 2002 despiking (check_goring_nikora_2002.py:9-27 semantics,
implemented from the published method — mhkit absent in image)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdat_spark.qc import check_goring_nikora, goring_nikora_mask


def test_kernel_catches_injected_spikes():
    rng = np.random.default_rng(3)
    n = 4000
    u = np.sin(np.arange(n) / 50.0) + rng.normal(0, 0.08, n)
    spikes = rng.choice(n, 25, replace=False)
    u2 = u.copy()
    u2[spikes] += rng.choice([-1, 1], 25) * rng.uniform(1.5, 3.0, 25)
    mask = goring_nikora_mask(u2)
    assert mask[spikes].sum() == 25          # every injected spike flagged
    assert (mask.sum() - 25) / (n - 25) < 0.01  # ~no false positives
    assert goring_nikora_mask(u).sum() / n < 0.01  # clean signal stays clean
    # NaNs are not spikes (CheckMissing's job)
    u3 = u2.copy(); u3[::100] = np.nan
    assert goring_nikora_mask(u3)[np.isnan(u3)].sum() == 0
    # small-amplitude sharp spike caught via the curvature plane
    u4 = u.copy(); u4[2000] += 0.9
    assert goring_nikora_mask(u4)[2000]


def test_spark_wrapper_matches_kernel(spark):
    rng = np.random.default_rng(11)
    rows = []
    expected = {}
    for conv in ("a", "b"):
        n = 600
        u = np.cos(np.arange(n) / 30.0) + rng.normal(0, 0.05, n)
        hit = rng.choice(n, 6, replace=False)
        u[hit] += 2.5
        expected[conv] = goring_nikora_mask(u)
        rows += [(conv, i, float(i), float(u[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, x double, value double")
    out = check_goring_nikora(df, "value", ["conv_id"], order_col="x")
    got = {(r["conv_id"], r["turn_idx"]): r["qc_gn_value"] for r in out.collect()}
    for conv, exp in expected.items():
        for i in range(len(exp)):
            assert got[(conv, i)] == bool(exp[i])
