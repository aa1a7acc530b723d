"""Measured single-node reference baseline for the tier rollup.

The reference (tsdat) publishes no benchmark numbers (BASELINE.md), so the
"matches-or-beats the reference's single-node throughput at the same data
scale" claim needs a measured stand-in. This script times TWO single-process
implementations of the same 1m/1h/1d rollup (counts, token sums, latency
count, discrete p50/p95 per (conv_id, role, bin)) on the same deterministic
synthetic transcript table the engine benches use:

1. ``reference-style``: pandas groupby + per-group numpy quantile — the
   granularity of tsdat's transform core, which loops output bins in Python
   (``tsdat/transform_v2/bin_average/calculate_bin_average.py:75-109``).
   This is the faithful analog of what the reference would do, NOT a
   strawman: each group's math is numpy, only the loop is Python.
2. ``vectorized``: the strongest single-node formulation we know — global
   sort + ``np.add.reduceat`` boundary slicing, one pass per grain (the
   same kernel shape as the engine's phase-1, minus Spark).

Each grain recomputes from raw (a single-node reference has no mergeable
tier state). Output: one JSON line with seconds + rolled-up points/s per
variant, comparable to ``scaling_bench.py`` / ``bench.py`` numbers.

Usage: python scripts/singlenode_baseline.py [n_turns] (default 2_400_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRAIN_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def make_input(n_turns: int) -> pd.DataFrame:
    """Generate the synthetic transcript table via the engine's deterministic
    generator (one Spark pass), then hand it to pandas — generation is NOT
    timed; both baselines below are pure single-process."""
    from tsdat_spark.session import get_spark
    from tsdat_spark.standardize import with_token_len, with_turn_latency
    from tsdat_spark.synth import SynthSpec, generate_transcripts

    spark = get_spark(app_name="singlenode_gen", cores=16, shuffle_partitions=16)
    n_convs = max(n_turns // 4000, 8)
    spec = SynthSpec(n_convs=n_convs, base_turns=4000, n_mega=max(n_convs // 100, 1),
                     mega_turns=40_000, partitions=32)
    df = with_turn_latency(with_token_len(generate_transcripts(spark, spec)))
    pdf = df.select("conv_id", "role", "ts", "token_len", "latency_us").toPandas()
    spark.stop()
    return pdf


def prep(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({
        "conv_id": pdf["conv_id"].astype("category"),
        "role": pdf["role"].astype("category"),
        "ts_us": pdf["ts"].astype("datetime64[us]").astype("int64"),
        "token_len": pdf["token_len"].fillna(0).astype("int64"),
        "latency_us": pdf["latency_us"].astype("float64"),
    })
    return out


def rollup_reference_style(t: pd.DataFrame, grain_us: int) -> int:
    """Per-group Python loop with numpy math per group (tsdat granularity)."""
    b = t.assign(bin_us=(t["ts_us"] // grain_us) * grain_us)
    n_groups = 0
    for _, g in b.groupby(["conv_id", "role", "bin_us"], observed=True, sort=False):
        lat = g["latency_us"].to_numpy()
        lat = lat[~np.isnan(lat)]
        _ = len(g)
        _ = g["token_len"].to_numpy().sum()
        if lat.size:
            lat = np.sort(lat)
            _ = lat[int((lat.size - 1) * 0.5)]
            _ = lat[int((lat.size - 1) * 0.95)]
        n_groups += 1
    return n_groups


def rollup_vectorized(t: pd.DataFrame, grain_us: int) -> int:
    """Sort + reduceat: the best single-node shape (engine phase-1 kernel)."""
    conv = t["conv_id"].cat.codes.to_numpy().astype("int64")
    role = t["role"].cat.codes.to_numpy().astype("int64")
    bins = (t["ts_us"].to_numpy() // grain_us)
    key = (conv * 8 + role) * (bins.max() + 1) + bins
    lat = t["latency_us"].to_numpy()
    tok = t["token_len"].to_numpy()

    order = np.lexsort((lat, key))  # group-major, latency-minor: quantiles by slicing
    k, la, to = key[order], lat[order], tok[order]
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    ends = np.concatenate([starts[1:], [len(k)]])
    n_per = ends - starts
    _ = np.add.reduceat(to, starts)
    nn = (~np.isnan(la)).astype("int64")
    n_lat = np.add.reduceat(nn, starts)
    # NaNs sort last within each group, so the q-th non-null element is at
    # start + floor((n_lat-1)*q) — fully vectorized discrete quantiles.
    has = n_lat > 0
    p50_idx = starts + np.floor((np.maximum(n_lat, 1) - 1) * 0.5).astype("int64")
    p95_idx = starts + np.floor((np.maximum(n_lat, 1) - 1) * 0.95).astype("int64")
    _ = np.where(has, la[np.minimum(p50_idx, len(la) - 1)], np.nan)
    _ = np.where(has, la[np.minimum(p95_idx, len(la) - 1)], np.nan)
    return len(starts)


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    pdf = prep(make_input(n_turns))
    print(f"input: {len(pdf)} turns", flush=True)

    results: dict[str, dict] = {}
    for name, fn in (("vectorized", rollup_vectorized), ("reference_style", rollup_reference_style)):
        total_s, total_pts = 0.0, 0
        per = {}
        for grain, gus in GRAIN_US.items():
            t0 = time.time()
            pts = fn(pdf, gus)
            dt = time.time() - t0
            per[grain] = round(dt, 2)
            total_s += dt
            total_pts += pts
            print(f"{name} {grain}: {dt:.2f}s {pts} points", flush=True)
        results[name] = {
            "sec": round(total_s, 2),
            "rolled_points": total_pts,
            "points_per_sec": round(total_pts / total_s, 1),
            "per_grain_sec": per,
        }

    print(json.dumps({"n_turns": len(pdf), "single_node": results}))


if __name__ == "__main__":
    main()
