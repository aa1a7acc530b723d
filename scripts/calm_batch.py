"""Calm-window evidence harness: single-node baseline vs engine at 8 and
32 pinned cores, each component measured inside its own calm host window.

The sandbox VM's DRAM bandwidth is hypervisor-throttled in episodes with
~1-2 minute calm spans (BENCH.md §noise) — too short for one back-to-back
sn+8+32 batch (the first run of this harness showed every batch opening
calm and closing throttled). So each COMPONENT (single-node vectorized
rollup / pinned-8 engine cascade / pinned-32 engine cascade) is gated on
its own opening probe (single-thread 10M-double sort < threshold) and
accepted only when the closing probe is also calm, i.e. the measurement
sat entirely inside one calm span. Components rotate until each has
``n_good`` accepted samples; the best accepted sample per component is the
calm-window number, and every sample is kept with its probes. All three
components read the SAME pre-generated input, so best-vs-best compares
like with like at the host's unthrottled capability.

Usage: python scripts/calm_batch.py [n_turns] [n_good] [probe_s]
       (defaults 9_600_000 2 4.5)
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
    """Component-gated mode: the host's calm spans last ~1-2 minutes —
    shorter than a full sn+8+32 batch — so each COMPONENT is gated on its
    own open probe and accepted only if the close probe is also calm
    (measured entirely inside one calm span). Components rotate so samples
    accumulate evenly; the best accepted sample per component is the
    calm-window number, and every sample (accepted or not) is kept in the
    JSON with its probes."""
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    n_good = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    calm_s = float(sys.argv[3]) if len(sys.argv) > 3 else 4.5

    import subprocess

    from scaling_bench import GEN, run_leg

    import atexit
    import shutil

    tmp = tempfile.mkdtemp(prefix="calm_batch_")
    atexit.register(shutil.rmtree, tmp, True)
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

    from singlenode_baseline import rollup_engine_kernel

    comps = {
        "single_node": lambda: single_node(pdf),
        "single_node_samejob": lambda: rollup_engine_kernel(pdf, os.path.join(tmp, "osn")),
        "engine_8": lambda: run_leg(8, REPO, base, os.path.join(tmp, "o8")),
        "engine_32": lambda: run_leg(32, REPO, base, os.path.join(tmp, "o32")),
    }
    samples = {k: [] for k in comps}
    accepted = {k: 0 for k in comps}
    deadline = time.time() + 3 * 3600

    while min(accepted.values()) < n_good and time.time() < deadline:
        p0 = probe()
        print(f"{time.strftime('%H:%M:%S')} probe={p0:.2f}s", flush=True)
        if p0 >= calm_s:
            time.sleep(120)
            continue
        # fewest accepted first; ties -> fewest attempts
        name = min(comps, key=lambda k: (accepted[k], len(samples[k])))
        r = comps[name]()
        p1 = probe()
        ok = p1 < calm_s
        s = {"component": name, "probe_open_s": round(p0, 2),
             "probe_close_s": round(p1, 2), "accepted": ok, "result": r}
        samples[name].append(s)
        if ok:
            accepted[name] += 1
        print(json.dumps(s), flush=True)
        time.sleep(30)

    def pps(s):
        r = s["result"]
        return r.get("points_per_sec") or r.get("rollup_points_per_sec")

    # calm figures come ONLY from accepted samples — a component with no
    # accepted sample is reported separately (best_any) and excluded from
    # the calm ratios rather than silently substituting a throttled number
    best = {k: max(pps(s) for s in ss if s["accepted"])
            for k, ss in samples.items() if any(s["accepted"] for s in ss)}
    best_any = {k: max(pps(s) for s in ss) for k, ss in samples.items() if ss}
    out = {"n_turns": len(pdf), "calm_threshold_s": calm_s,
           "best_calm_points_per_sec": best,
           "best_any_points_per_sec": best_any, "samples": samples}
    if "engine_32" in best and "single_node" in best:
        out["engine32_vs_single_node_calm"] = round(best["engine_32"] / best["single_node"], 2)
    if "engine_32" in best and "engine_8" in best:
        out["eff_8_32_raw_calm"] = round(best["engine_32"] / best["engine_8"] / 4, 3)
    path = os.path.join(REPO, "calm_batch_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {json.dumps(out['best_calm_points_per_sec'])}", flush=True)


if __name__ == "__main__":
    main()
