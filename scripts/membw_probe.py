"""Multi-core DRAM-bandwidth probe (STREAM-triad style).

The single-thread 10M-double sort probe used by calm_bench.py cannot see
the host's MULTI-core bandwidth throttle phases (single-thread latency
stays calm while 32-core aggregate bandwidth drops several-fold), which
is exactly the phase that inflates window/shuffle-heavy queries. This
probe runs a numpy triad (a = b + s*c over 64 MB arrays) in P pinned
processes simultaneously and reports aggregate GB/s, reproducing the
methodology behind membw_calibration.json.

Usage: python scripts/membw_probe.py [procs ...]   (default: 1 8 32)
Prints one JSON line: {"procs": {"1": GBps, ...}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 8_000_000  # 64 MB per array, 3 arrays/proc


def _triad(core: int, reps: int, out):
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import numpy as np

    b = np.random.default_rng(core).random(N)
    c = np.random.default_rng(core + 1).random(N)
    a = np.empty_like(b)

    def triad():
        # fused, no temporary (ADVICE r6): np.add(b, 3.0*c, out=a)
        # allocated a temp for 3.0*c, making real traffic ~40 B/elem while
        # the formula assumed 24 — the probe understated bandwidth vs the
        # STREAM-triad methodology it reproduces
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)

    triad()  # warmup
    t0 = time.time()
    for _ in range(reps):
        triad()
    dt = time.time() - t0
    # STREAM triad accounting: 3 arrays touched + write-allocate = 32 B/elem
    out.put(N * 32 * reps / dt / 1e9)


def measure(procs: int, reps: int = 10) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_triad, args=(i % os.cpu_count(), reps, q))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 1)


def main():
    levels = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    print(json.dumps({"procs": {str(p): measure(p) for p in levels}}))


if __name__ == "__main__":
    main()
