"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

The sandbox has no multi-node cluster, so per driver instructions the same
job runs at two parallelism levels — local[8] (N) and local[32] (4N) — on
the SAME input, and we report throughput at both plus scaling efficiency
(= throughput_4N / throughput_N / 4). Results land in BENCH.md.

The measured job is the engine's headline pipeline on the deterministic
synthetic transcript table: standardize → 1m tier (salted two-phase +
t-digest) → 1h/1d re-aggregation → gorilla cold encode. The synth size is
chosen large enough that task work, not job-scheduling overhead, dominates
(fixed overheads are what kill small-input scaling on a single box).

Usage: python scripts/scaling_bench.py [n_turns] (default 4_000_000)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
n_turns = {n_turns}
cores = {cores}
from pyspark.sql import functions as F
from tsdat_spark.session import get_spark
from tsdat_spark.synth import SynthSpec, generate_transcripts
from tsdat_spark.standardize import with_token_len, with_turn_latency
from tsdat_spark.rollup import rollup_tier, reaggregate_tier
from tsdat_spark.io.coldstore import encode_cold_blocks

spark = get_spark(app_name=f"scaling_{{cores}}", cores=cores, shuffle_partitions=cores)
n_convs = max(n_turns // 4000, 8)
spec = SynthSpec(n_convs=n_convs, base_turns=4000, n_mega=max(n_convs // 100, 1),
                 mega_turns=80_000, partitions=cores * 4)
base = with_turn_latency(with_token_len(generate_transcripts(spark, spec)))
base = base.persist()
n = base.count()  # materialize input once, outside the timed window

t0 = time.time()
t1m = rollup_tier(base, "1m", salt=8).persist()
n1m = t1m.count()
t_1m = time.time() - t0

t0 = time.time()
t1h = reaggregate_tier(t1m, "1h").persist()
n1h = t1h.count()
t_1h = time.time() - t0

t0 = time.time()
n1d = reaggregate_tier(t1h, "1d").count()
t_1d = time.time() - t0

t0 = time.time()
blocks = encode_cold_blocks(base.withColumn("v", F.col("turn_idx").cast("double")), ["conv_id"], "ts", "v")
nb = blocks.select(F.sum("n_points")).first()[0]
t_cold = time.time() - t0

print("RESULT " + json.dumps({{
    "cores": cores, "n_turns": n, "rolled_points": n1m + n1h + n1d,
    "t_1m": t_1m, "t_1h": t_1h, "t_1d": t_1d, "t_cold": t_cold,
    "rollup_sec": t_1m + t_1h + t_1d,
    "rollup_points_per_sec": (n1m + n1h + n1d) / (t_1m + t_1h + t_1d),
    "raw_turns_per_sec": n / t_1m,
    "cold_points_per_sec": nb / t_cold,
}}))
spark.stop()
"""


def run(cores: int, n_turns: int, repo: str) -> dict:
    code = WORKER.format(repo=repo, n_turns=n_turns, cores=cores)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    results = {}
    for cores in (8, 32):
        print(f"running cores={cores} ...", flush=True)
        results[cores] = run(cores, n_turns, repo)
        print(json.dumps(results[cores], indent=1), flush=True)

    r8, r32 = results[8], results[32]
    effs = {
        k: round(r32[k] / r8[k] / 4.0, 3)
        for k in ("rollup_points_per_sec", "raw_turns_per_sec", "cold_points_per_sec")
    }
    summary = {"N": 8, "4N": 32, "n_turns": r8["n_turns"], "r8": r8, "r32": r32, "efficiency": effs}
    print(json.dumps(summary, indent=1))
    with open(os.path.join(repo, "scaling_results.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
