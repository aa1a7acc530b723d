"""Goring-Nikora 2002 despiking (check_goring_nikora_2002.py:9-27 semantics,
implemented from the published method — mhkit absent in image)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsdat_spark.qc import check_goring_nikora, goring_nikora_mask


def test_kernel_catches_injected_spikes():
    """Both modes: raw published method (default, mhkit-comparable) and the
    opt-in neighbor-confirmation extension (confirm=True)."""
    rng = np.random.default_rng(3)
    n = 4000
    u = np.sin(np.arange(n) / 50.0) + rng.normal(0, 0.08, n)
    spikes = rng.choice(n, 25, replace=False)
    u2 = u.copy()
    u2[spikes] += rng.choice([-1, 1], 25) * rng.uniform(1.5, 3.0, 25)

    raw = goring_nikora_mask(u2)  # default = published behavior
    assert raw[spikes].sum() == 25           # every injected spike flagged
    # raw mode over-flags contaminated NEIGHBORS of spikes (inherent to the
    # Δu planes) but stays bounded, and clean signal stays clean
    assert (raw.sum() - 25) / (n - 25) < 0.05
    assert goring_nikora_mask(u).sum() / n < 0.01

    conf = goring_nikora_mask(u2, confirm=True)
    assert conf[spikes].sum() == 25          # confirmation keeps every spike
    assert (conf.sum() - 25) / (n - 25) < 0.001  # ...and drops the neighbors
    assert not (conf & ~raw).any()           # confirm mask ⊆ raw mask

    # NaNs are not spikes (CheckMissing's job) — both modes
    u3 = u2.copy(); u3[::100] = np.nan
    assert goring_nikora_mask(u3)[np.isnan(u3)].sum() == 0
    assert goring_nikora_mask(u3, confirm=True)[np.isnan(u3)].sum() == 0
    # small-amplitude sharp spike caught via the curvature plane — both modes
    u4 = u.copy(); u4[2000] += 0.9
    assert goring_nikora_mask(u4)[2000]
    assert goring_nikora_mask(u4, confirm=True)[2000]


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
        expected[conv, "confirm"] = goring_nikora_mask(u, confirm=True)
        rows += [(conv, i, float(i), float(u[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, x double, value double")
    for confirm in (False, True):
        out = check_goring_nikora(df, "value", ["conv_id"], order_col="x", confirm=confirm)
        got = {(r["conv_id"], r["turn_idx"]): r["qc_gn_value"] for r in out.collect()}
        for conv in ("a", "b"):
            exp = expected[(conv, "confirm")] if confirm else expected[conv]
            for i in range(len(exp)):
                assert got[(conv, i)] == bool(exp[i])


def test_block_parallel_matches_sequential(spark):
    """block_parallel=True spreads a mega-series across (series, block)
    tasks; the published method is block-independent, so the mask must be
    bit-identical to the sequential path (incl. across the block seam)."""
    rng = np.random.default_rng(21)
    n = 2600  # > 2 blocks at n_points=1000, with a partial tail block
    u = np.sin(np.arange(n) / 40.0) + rng.normal(0, 0.06, n)
    hit = rng.choice(n, 12, replace=False)
    u[hit] += 2.8
    u[999] += 2.8   # spike exactly AT a block boundary
    u[1000] += 2.8  # and just after it
    df = spark.createDataFrame(
        [("m", i, float(i), float(u[i])) for i in range(n)],
        "conv_id string, turn_idx int, x double, value double",
    ).repartition(8)

    seq = check_goring_nikora(df, "value", ["conv_id"], order_col="x", n_points=1000)
    par = check_goring_nikora(df, "value", ["conv_id"], order_col="x", n_points=1000,
                              block_parallel=True)
    got_seq = {r["turn_idx"]: r["qc_gn_value"] for r in seq.collect()}
    got_par = {r["turn_idx"]: r["qc_gn_value"] for r in par.collect()}
    assert got_seq == got_par
    # kernel truth
    exp = goring_nikora_mask(u, n_points=1000)
    assert all(got_par[i] == bool(exp[i]) for i in range(n))
    assert got_par[999] and got_par[1000]
    # the parallel plan really has more than one group key
    assert par.count() == n
