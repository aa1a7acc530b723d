"""Property-based tests (hypothesis) for the pure kernels: the codec, the
sketch, and the unit table — invariants that golden cases can't sweep."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tsdat_spark.compress.gorilla import gorilla_decode, gorilla_encode
from tsdat_spark.rollup.tdigest import TDigest, fast_bytes_from_sorted, fast_merge_bytes
from tsdat_spark.units import conversion

# --------------------------------------------------------------- gorilla ---

finite_floats = st.floats(allow_nan=False, allow_infinity=False, width=64)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.data(),
)
def test_gorilla_roundtrip_is_exact(deltas, data):
    """encode→decode is bit-exact for ANY finite values over ANY
    non-decreasing microsecond timestamps (delta-of-delta handles bursts,
    regular cadence, and large jumps alike)."""
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) + 1_600_000_000_000_000
    vals = np.asarray(
        data.draw(st.lists(finite_floats, min_size=len(ts), max_size=len(ts))),
        dtype=np.float64,
    )
    t2, v2 = gorilla_decode(gorilla_encode(ts, vals))
    assert np.array_equal(t2, ts)
    # bit-exact: compare the raw float bits (covers -0.0 vs 0.0 etc.)
    assert np.array_equal(v2.view(np.int64), vals.view(np.int64))


# --------------------------------------------------------------- t-digest ---


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
             min_size=1, max_size=400),
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
             min_size=1, max_size=400),
)
def test_tdigest_merge_is_order_insensitive_and_bounded(xs, ys):
    """merge(A,B) == merge(B,A) byte-for-byte after canonicalization of
    quantiles, weights are exact, and merged quantiles live within the
    combined value range (sketch sanity at any skew)."""
    a = fast_bytes_from_sorted(np.sort(np.asarray(xs, dtype=np.float64)))
    b = fast_bytes_from_sorted(np.sort(np.asarray(ys, dtype=np.float64)))
    ab = TDigest.from_bytes(fast_merge_bytes([a, b])[0])
    ba = TDigest.from_bytes(fast_merge_bytes([b, a])[0])
    assert ab.total_weight == ba.total_weight == len(xs) + len(ys)
    lo, hi = min(min(xs), min(ys)), max(max(xs), max(ys))
    for q in (0.0, 0.25, 0.5, 0.95, 1.0):
        qa, qb = ab.quantile(q), ba.quantile(q)
        assert lo <= qa <= hi and lo <= qb <= hi
        # order-insensitivity within float tolerance of the k-scale merge
        assert qa == qb or abs(qa - qb) <= 1e-9 * max(1.0, abs(qa))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=50, max_size=500))
def test_tdigest_median_rank_error(xs):
    """p50 of the sketch lands within 10% rank error of the exact median —
    the t-digest paper's interior-quantile guarantee at compression 100."""
    v = np.sort(np.asarray(xs, dtype=np.float64))
    d = TDigest.from_bytes(fast_bytes_from_sorted(v))
    est = d.quantile(0.5)
    # ties: the estimate's rank is an interval [lo, hi); it must overlap
    # the 10%-rank-error band around the median
    lo = np.searchsorted(v, est, side="left") / len(v)
    hi = np.searchsorted(v, est, side="right") / len(v)
    assert hi >= 0.35 and lo <= 0.65


# --------------------------------------------------------------- units ------


@settings(max_examples=50, deadline=None)
@given(st.sampled_from(["m", "km", "cm", "mm", "m/s", "km/h", "degC", "degF",
                        "K", "Pa", "hPa", "g", "kg", "s", "ms", "hour"]),
       st.floats(min_value=-1e4, max_value=1e4, allow_nan=False))
def test_units_roundtrip_inverse(u, x):
    """For every supported pair (u -> v -> u), the composed conversion is
    the identity to float precision."""
    partners = {
        "m": "km", "km": "cm", "cm": "mm", "mm": "m",
        "m/s": "km/h", "km/h": "m/s",
        "degC": "degF", "degF": "K", "K": "degC",
        "Pa": "hPa", "hPa": "Pa", "g": "kg", "kg": "g",
        "s": "ms", "ms": "hour", "hour": "s",
    }
    v = partners[u]
    s1, o1 = conversion(u, v)
    s2, o2 = conversion(v, u)
    y = (x * s1 + o1) * s2 + o2
    assert abs(y - x) <= 1e-9 * max(1.0, abs(x))
