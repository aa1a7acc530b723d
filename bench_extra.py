"""Per-query isolation bench (guide §1.4): times individual declared queries
with the noop sink and optionally dumps .explain("formatted") plans.

Usage:
    python bench_extra.py [query ...] [--sf DIR] [--repeats N] [--explain DIR]

Never used by the driver; bench.py stays the frozen measurement contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory to write <name>.txt formatted plans")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from tsdat_spark.session import get_spark

    spark = get_spark(app_name="tsdat_spark_bench_extra", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    qs = entrymod.queries()
    names = args.names or list(qs)

    timings: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.repeats):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        if samples:
            timings[name] = samples
            print(json.dumps({"query": name, "samples": samples, "min": min(samples)}), flush=True)
        spark.sparkContext.setJobDescription(None)

    total_min = round(sum(min(v) for v in timings.values()), 3)
    print(json.dumps({"metric": "bench_extra_total_min_sec", "value": total_min,
                      "sf_dir": args.sf, "queries_min": {k: min(v) for k, v in timings.items()}}))


if __name__ == "__main__":
    main()
