"""Bounded-gap cubic spline fill — CubicSplineInterp re-expressed.

tsdat's ``CubicSplineInterp`` handler (``tsdat/qc/handlers/
cubic_spline_interp.py:9-53``) delegates to mhkit's ``clean_fill``:
masked samples become NaN, then NaN runs no longer than ``max_gap`` are
interpolated from up to ``n_points`` valid neighbors on each side with a
cubic method; longer runs stay NaN. mhkit/scipy are not in this image, so
the cubic kernel here is a from-scratch *natural cubic spline* (tridiagonal
second-derivative solve, vectorized piecewise evaluation) in pure numpy.

The Spark wrapper (:func:`tsdat_spark.qc.handlers.cubic_spline_interp`)
runs this per series inside ``mapInPandas`` batches using the engine's
sort+boundary slicing — one Python call per partition, never per group.
"""

from __future__ import annotations

import numpy as np


def _natural_spline_eval(xs: np.ndarray, ys: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline through (xs, ys) at xq.

    xs strictly increasing, len >= 2. Natural boundary (y''=0 at both ends).
    """
    n = xs.size
    if n == 2:
        t = (xq - xs[0]) / (xs[1] - xs[0])
        return ys[0] + t * (ys[1] - ys[0])
    h = np.diff(xs)
    # tridiagonal system for interior second derivatives m[1..n-2]
    # (m[0] = m[n-1] = 0): sub/main/sup diagonals + rhs
    main = 2.0 * (h[:-1] + h[1:])
    rhs = 6.0 * (np.diff(ys[1:]) / h[1:] - np.diff(ys[:-1]) / h[:-1])
    # Thomas algorithm
    k = n - 2
    c = np.empty(k)
    d = np.empty(k)
    c[0] = h[1] / main[0]
    d[0] = rhs[0] / main[0]
    for i in range(1, k):
        denom = main[i] - h[i] * c[i - 1]
        c[i] = (h[i + 1] / denom) if i < k - 1 else 0.0
        d[i] = (rhs[i] - h[i] * d[i - 1]) / denom
    m = np.zeros(n)
    m[k] = d[k - 1]
    for i in range(k - 2, -1, -1):
        m[i + 1] = d[i] - c[i] * m[i + 2]
    # piecewise cubic evaluation
    idx = np.clip(np.searchsorted(xs, xq, side="right") - 1, 0, n - 2)
    dx = xq - xs[idx]
    hi = h[idx]
    a = (m[idx + 1] - m[idx]) / (6.0 * hi)
    b = m[idx] / 2.0
    cc = (ys[idx + 1] - ys[idx]) / hi - hi * (2.0 * m[idx] + m[idx + 1]) / 6.0
    return ys[idx] + dx * (cc + dx * (b + dx * a))


def cubic_spline_fill(
    x: np.ndarray,
    y: np.ndarray,
    mask: np.ndarray,
    n_points: int = 12,
    max_gap: int = 6,
) -> np.ndarray:
    """Fill masked samples of one series (see module docstring).

    ``x``: strictly increasing sample coordinate; ``y``: values; ``mask``:
    True where the value failed QC. Returns a copy of ``y`` with masked
    runs of length <= max_gap replaced by spline estimates; masked runs
    longer than max_gap (and runs without valid context on BOTH sides)
    become NaN, exactly mhkit ``clean_fill``'s contract.
    """
    y = np.asarray(y, dtype=np.float64).copy()
    bad = np.asarray(mask, dtype=bool) | np.isnan(y)
    y[bad] = np.nan
    if not bad.any() or bad.all():
        return y
    n = y.size
    # NaN run boundaries
    padded = np.concatenate([[False], bad, [False]])
    starts = np.flatnonzero(padded[1:] & ~padded[:-1])
    ends = np.flatnonzero(~padded[1:] & padded[:-1])  # exclusive
    valid_idx = np.flatnonzero(~bad)
    for s, e in zip(starts, ends):
        if e - s > max_gap:
            continue  # too long: stays NaN
        left = valid_idx[valid_idx < s][-n_points:]
        right = valid_idx[valid_idx >= e][:n_points]
        if left.size == 0 or right.size == 0:
            continue  # edge gap: no context on one side, stays NaN
        ctx = np.concatenate([left, right])
        y[s:e] = _natural_spline_eval(x[ctx], y[ctx], x[s:e])
    return y
