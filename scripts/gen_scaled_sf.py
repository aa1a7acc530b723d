"""Generate a scaled replica of a testdata sf dir for LOCAL perf measurement.

Round-7 measurement helper (never used by the driver or by bench.py's
contract): the driver benches at a driver-generated scale factor
(BENCH_r06.json: sf=1.0) whose data does not survive between rounds, so
this script builds a deterministic K-fold replica of an existing sf dir
with remapped keys so plans/perf can be evaluated at that scale locally:

- dimension tables (region, nation) are copied;
- fact tables get per-copy key offsets so key cardinality scales;
- documents: every token in copy k>0 gets a "~k" suffix — cross-copy
  shingle/token overlap is zero, so per-shingle document frequency (and
  with it the cost of dedup/jaccard/LSH joins) scales the way a real
  larger corpus does instead of multiplying duplicate density by K;
- embeddings: copy k's vectors are the originals circularly shifted by k
  dimensions — norms and component distribution are preserved exactly,
  but every hyperplane/centroid dot product sees an effectively fresh
  projection, so LSH/IVF bucket sizes scale the way fresh vectors would
  instead of collapsing into K-fold exact-duplicate buckets (additive
  jitter small enough to preserve distributions almost never flips a
  dot-product sign, which K-folds every bucket and quadratically
  inflates candidate pairs — measured 10.7 s vs 2.6 s on
  ann_lsh_multi).

Usage: python scripts/gen_scaled_sf.py SRC_DIR DST_DIR K
e.g.   python scripts/gen_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def emit(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{src}/{t}.parquet'")

    copies = f"(SELECT unnest(range({k})) AS __k)"

    emit("customer", f"""
        SELECT c_custkey + __k * 100000000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', {copies}""")
    emit("supplier", f"""
        SELECT s.* REPLACE (s_suppkey + __k * 100000000 AS s_suppkey)
        FROM '{src}/supplier.parquet' s, {copies}""")
    emit("part", f"""
        SELECT p.* REPLACE (p_partkey + __k * 100000000 AS p_partkey)
        FROM '{src}/part.parquet' p, {copies}""")
    emit("orders", f"""
        SELECT o_orderkey + __k * 100000000 AS o_orderkey,
               o_custkey + __k * 100000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', {copies}""")
    emit("lineitem", f"""
        SELECT l_orderkey + __k * 100000000 AS l_orderkey,
               l_partkey + __k * 100000000 AS l_partkey,
               l_suppkey + __k * 100000000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', {copies}""")
    emit("events", f"""
        SELECT event_id + __k * 1000000000 AS event_id, ts,
               user_id + __k * 1000000000 AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', {copies}""")
    emit("documents", f"""
        SELECT doc_id + __k * 1000000000 AS doc_id,
               CASE WHEN __k = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1~' || __k, 'g')
               END AS text,
               lang, source,
               CASE WHEN __k = 0 THEN n_chars
                    ELSE length(regexp_replace(text, '(\\S+)', '\\1~' || __k, 'g'))
               END AS n_chars
        FROM '{src}/documents.parquet', {copies}""")
    emit("embeddings", f"""
        SELECT vec_id + __k * 1000000000 AS vec_id,
               CASE WHEN __k = 0 THEN embedding
                    ELSE list_concat(
                        embedding[(1 + (__k % len(embedding))):],
                        embedding[1:(__k % len(embedding))])
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', {copies}""")
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
