"""Calm-window wrapper for bench.py: wait for a calm host probe, run the
bench suite once, verify the closing probe is also calm, retry otherwise.

Usage: python scripts/calm_bench.py [out_json] [probe_s] [max_wait_s]
"""

from __future__ import annotations

import json
import os
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
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_calm.json")
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    max_wait = float(sys.argv[3]) if len(sys.argv) > 3 else 7200
    t_start = time.time()
    attempts = []
    while time.time() - t_start < max_wait:
        p_open = probe()
        print(f"[calm_bench] opening probe {p_open:.2f}s", flush=True)
        if p_open > thresh:
            time.sleep(60)
            continue
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, env=env, cwd=REPO)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        p_close = probe()
        print(f"[calm_bench] closing probe {p_close:.2f}s", flush=True)
        bench = json.loads(line[-1]) if line else None
        # endpoint probes can miss mid-run throttling (measured: open 1.9s /
        # close 0.4s around a 4x-starved suite) — also gate on the bench's
        # OWN in-run probe, which runs between the query timings.
        p_mid = (bench or {}).get("extra", {}).get("host_probe_sort10m_sec")
        rec = {"opening_probe_s": round(p_open, 2), "closing_probe_s": round(p_close, 2),
               "inbench_probe_s": p_mid,
               "accepted": p_close <= thresh and bool(line)
               and (p_mid is None or p_mid <= thresh),
               "bench": bench,
               "stderr_tail": r.stderr[-500:] if not line else ""}
        attempts.append(rec)
        with open(out, "w") as f:
            json.dump({"attempts": attempts}, f, indent=1)
        if rec["accepted"]:
            print("[calm_bench] ACCEPTED", flush=True)
            return
        print("[calm_bench] rejected (throttled window), retrying", flush=True)
        time.sleep(45)
    print("[calm_bench] gave up (max_wait)", flush=True)


if __name__ == "__main__":
    main()
