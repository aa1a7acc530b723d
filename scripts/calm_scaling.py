"""Calm-window wrapper for the 8→32 scaling pair: wait for a calm probe,
run scripts/scaling_bench.py once at 8,32 cores, accept only if the
closing probe is calm too (the 8→32 pair is memory-bus-bound on this VM —
BENCH.md §round-3 settlement — so only a fully-calm window says anything).

Usage: python scripts/calm_scaling.py [n_turns] [out_json] [probe_s] [max_wait_s]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    t0 = time.time()
    np.sort(np.random.default_rng(0).random(10_000_000))
    return time.time() - t0


def main():
    n_turns = sys.argv[1] if len(sys.argv) > 1 else "5000000"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "scaling_results_r4_832.json")
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 4.5
    max_wait = float(sys.argv[4]) if len(sys.argv) > 4 else 5400
    t_start = time.time()
    attempts = []
    while time.time() - t_start < max_wait:
        p_open = probe()
        print(f"[calm_scaling] opening probe {p_open:.2f}s", flush=True)
        if p_open > thresh:
            time.sleep(60)
            continue
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
             n_turns, "2", "8,32"],
            capture_output=True, text=True, cwd=REPO)
        p_close = probe()
        print(f"[calm_scaling] closing probe {p_close:.2f}s", flush=True)
        res_path = os.path.join(REPO, "scaling_results.json")
        res = json.load(open(res_path)) if os.path.exists(res_path) else None
        rec = {"opening_probe_s": round(p_open, 2), "closing_probe_s": round(p_close, 2),
               "accepted": p_close <= thresh and res is not None,
               "result": res, "stderr_tail": r.stderr[-400:] if res is None else ""}
        attempts.append(rec)
        with open(out, "w") as f:
            json.dump({"attempts": attempts}, f, indent=1)
        if rec["accepted"]:
            print("[calm_scaling] ACCEPTED", flush=True)
            return
        print("[calm_scaling] rejected, retrying", flush=True)
        time.sleep(45)
    print("[calm_scaling] gave up", flush=True)


if __name__ == "__main__":
    main()
