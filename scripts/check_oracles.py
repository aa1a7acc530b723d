"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row-count, schema
arity, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes → hex for comparability
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("Int", "UInt")) or str(df[c].dtype) in ("int32", "int8", "int16"):
            df[c] = df[c].astype("float64")  # unify nullable ints for compare
        elif str(df[c].dtype) == "int64":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(exp):
        issues.append(f"row count {len(got)} != {len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        issues.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return issues
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c], e[c]
            if gv.dtype.kind == "f":
                ok = np.allclose(gv.fillna(-1e308), ev.fillna(-1e308), rtol=0, atol=0, equal_nan=True)
            else:
                ok = gv.fillna("\0").equals(ev.fillna("\0")) if gv.dtype == object else gv.equals(ev)
            if not ok:
                diff = (gv != ev) if gv.dtype != "float64" else ~np.isclose(gv.fillna(-1e308), ev.fillna(-1e308), rtol=0, atol=0)
                n = int(np.asarray(diff).sum())
                idx = np.flatnonzero(np.asarray(diff))[:3]
                samples = [(c, i, gv.iloc[i], ev.iloc[i]) for i in idx]
                issues.append(f"column {c}: {n} value mismatches, e.g. {samples}")
    return issues


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from tsdat_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    record = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            record[name] = {"status": "fail", "error": f"spark: {exc}"}
            failures += 1
            continue
        if name not in oracles:
            dt = round(time.time() - t0, 1)
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows) [{dt}s]")
            record[name] = {"status": "rows_only", "rows": len(got), "sec": dt}
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            record[name] = {"status": "fail", "error": f"duckdb: {exc}"}
            failures += 1
            continue
        issues = compare(name, got, exp)
        dt = round(time.time() - t0, 1)
        if issues:
            failures += 1
            print(f"FAIL {name} [{dt}s]")
            for i in issues:
                print(f"   - {i}")
            record[name] = {"status": "fail", "issues": issues, "sec": dt}
        else:
            print(f"OK   {name}: {len(got)} rows [{dt}s]")
            record[name] = {"status": "ok", "rows": len(got), "sec": dt}
    print("failures:", failures)
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "failures": failures,
                       "n_checked": len(record), "queries": record}, f, indent=1)
        print("wrote", json_out)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
