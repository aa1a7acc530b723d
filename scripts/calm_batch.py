"""Same-window evidence batch: single-node baseline vs engine at 8 and 32
pinned cores, all measured back-to-back inside ONE calm host window.

The sandbox VM's DRAM bandwidth is hypervisor-throttled in multi-minute
episodes (BENCH.md §noise), so cross-window ratios are meaningless: a
throttled window deflates the 32-core engine far more than a 1-thread
baseline (aggregate bandwidth is capped), and vice versa. This harness
waits for a calm window (single-thread 10M-double sort < threshold), then
runs, consecutively, with one pre-generated input:

1. single-node vectorized rollup (strongest 1-thread formulation,
   ``singlenode_baseline.rollup_vectorized``) — 1m+1h+1d from raw;
2. engine tier cascade pinned to 8 cores (``scaling_bench.run_leg``);
3. engine tier cascade pinned to 32 cores;
4. the probe again (window-still-calm check).

Repeats until ``n_good`` batches whose closing probe is also calm, then
writes all batches to calm_batch_results.json. Ratios WITHIN a batch are
weather-controlled; the best batch is the engine-vs-single-node and
8→32 evidence.

Usage: python scripts/calm_batch.py [n_turns] [n_good] [probe_s]
       (defaults 9_600_000 2 2.5)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def probe() -> float:
    t0 = time.time()
    np.sort(np.random.default_rng(0).random(10_000_000))
    return time.time() - t0


def single_node(pdf) -> dict:
    from singlenode_baseline import GRAIN_US, rollup_vectorized

    total_s, total_pts = 0.0, 0
    for gus in GRAIN_US.values():
        t0 = time.time()
        total_pts += rollup_vectorized(pdf, gus)
        total_s += time.time() - t0
    return {"sec": round(total_s, 2), "rolled_points": total_pts,
            "points_per_sec": round(total_pts / total_s, 1)}


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    n_good = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    calm_s = float(sys.argv[3]) if len(sys.argv) > 3 else 2.5

    import subprocess

    from scaling_bench import GEN, run_leg

    tmp = tempfile.mkdtemp(prefix="calm_batch_")
    base = os.path.join(tmp, "base")
    gen = subprocess.run([sys.executable, "-c", GEN.format(repo=REPO, n_turns=n_turns, base=base)],
                        capture_output=True, text=True, timeout=3600)
    if "GENERATED" not in gen.stdout:
        raise RuntimeError(gen.stdout[-1000:] + gen.stderr[-2000:])
    print(gen.stdout.splitlines()[-1], flush=True)

    import pyarrow.parquet as pq
    from singlenode_baseline import prep

    pdf = prep(pq.read_table(base).to_pandas())
    print(f"pandas input ready: {len(pdf)} turns", flush=True)

    batches, good = [], 0
    deadline = time.time() + 3 * 3600
    while good < n_good and time.time() < deadline:
        p0 = probe()
        print(f"{time.strftime('%H:%M:%S')} probe={p0:.2f}s", flush=True)
        if p0 >= calm_s:
            time.sleep(150)
            continue
        sn = single_node(pdf)
        leg8 = run_leg(8, REPO, base, os.path.join(tmp, "o8"))
        leg32 = run_leg(32, REPO, base, os.path.join(tmp, "o32"))
        p1 = probe()
        batch = {
            "probe_open_s": round(p0, 2), "probe_close_s": round(p1, 2),
            "still_calm": p1 < calm_s,
            "single_node_vectorized": sn,
            "engine_8": leg8, "engine_32": leg32,
            "engine32_vs_single_node": round(
                leg32["rollup_points_per_sec"] / sn["points_per_sec"], 2),
            "eff_8_32_raw": round(
                leg32["rollup_points_per_sec"] / leg8["rollup_points_per_sec"] / 4, 3),
        }
        batches.append(batch)
        print(json.dumps(batch), flush=True)
        if batch["still_calm"]:
            good += 1

    out = os.path.join(REPO, "calm_batch_results.json")
    with open(out, "w") as f:
        json.dump({"n_turns": n_turns, "batches": batches}, f, indent=1)
    print(f"wrote {out} ({good} good batches)", flush=True)


if __name__ == "__main__":
    main()
