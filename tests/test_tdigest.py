"""t-digest sketch: accuracy, mergeability, serialization round-trip."""

import numpy as np
import pytest

from tsdat_spark.rollup.tdigest import TDigest


def test_quantile_accuracy_uniform():
    rng = np.random.RandomState(42)
    v = rng.uniform(0, 1000, 50_000)
    d = TDigest.from_values(v)
    for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
        exact = np.quantile(v, q)
        assert d.quantile(q) == pytest.approx(exact, abs=1000 * 0.01), q


def test_quantile_accuracy_lognormal():
    rng = np.random.RandomState(7)
    v = rng.lognormal(3, 1.5, 50_000)
    d = TDigest.from_values(v)
    for q in (0.5, 0.95, 0.99):
        exact = np.quantile(v, q)
        assert d.quantile(q) == pytest.approx(exact, rel=0.05), q


def test_merge_equals_whole():
    rng = np.random.RandomState(1)
    v = rng.exponential(100, 30_000)
    parts = np.array_split(v, 17)
    merged = TDigest.merge_all([TDigest.from_values(p) for p in parts])
    whole = TDigest.from_values(v)
    assert merged.total_weight == pytest.approx(len(v))
    for q in (0.5, 0.95):
        assert merged.quantile(q) == pytest.approx(whole.quantile(q), rel=0.02), q
        assert merged.quantile(q) == pytest.approx(np.quantile(v, q), rel=0.05), q


def test_merge_associative_enough():
    """((a+b)+c) vs (a+(b+c)): identical weights, quantiles within sketch error."""
    rng = np.random.RandomState(3)
    a, b, c = (TDigest.from_values(rng.normal(50, 10, 5000)) for _ in range(3))
    left = TDigest.merge_all([TDigest.merge_all([a, b]), c])
    right = TDigest.merge_all([a, TDigest.merge_all([b, c])])
    assert left.total_weight == right.total_weight
    assert left.quantile(0.5) == pytest.approx(right.quantile(0.5), rel=0.01)
    assert left.quantile(0.95) == pytest.approx(right.quantile(0.95), rel=0.01)


def test_compression_bound():
    v = np.random.RandomState(9).uniform(0, 1, 100_000)
    d = TDigest.from_values(v, compression=100)
    assert d.means.size <= 200  # ~δ centroids


def test_serialization_roundtrip():
    d = TDigest.from_values(np.arange(1000.0))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(d.means, d2.means)
    assert np.array_equal(d.weights, d2.weights)
    assert (d2.min_val, d2.max_val, d2.compression) == (d.min_val, d.max_val, d.compression)
    assert d2.quantile(0.5) == d.quantile(0.5)


def test_empty_and_singleton():
    e = TDigest.empty()
    assert np.isnan(e.quantile(0.5))
    assert e.total_weight == 0
    one = TDigest.from_values(np.array([42.0]))
    assert one.quantile(0.0) == 42.0
    assert one.quantile(0.5) == 42.0
    assert one.quantile(1.0) == 42.0
    # nan-only input behaves like empty
    nans = TDigest.from_values(np.array([np.nan, np.nan]))
    assert nans.total_weight == 0
    # merging empties is harmless
    m = TDigest.merge_all([e, one, nans])
    assert m.quantile(0.5) == 42.0
