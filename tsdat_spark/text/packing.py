"""Sequence packing: assign documents to fixed-size training sequences.

Training pipelines concatenate tokenized documents into fixed-length
sequences (e.g. 2048 or 8192 tokens); each document needs its global
starting offset in the token stream under a stable document order. That
offset is a GLOBAL prefix sum — the textbook "one window over everything"
formulation (``sum(...) over (order by doc_id)``) funnels the entire
corpus through a single reducer, which is exactly the kind of plan this
engine exists to avoid.

Implemented here as the classic two-phase distributed scan:

1. range-partition by ``doc_id`` and sort within partitions — Spark's
   ``repartitionByRange`` gives ordered, contiguous key ranges;
2. ``localCheckpoint`` the partitioned input so phases share one lineage
   (one materialization, no re-scan, boundaries identical by construction);
3. phase A: per-partition token totals — a partial-aggregated groupBy on
   ``spark_partition_id()`` that moves P rows, not N;
4. driver: exclusive prefix over the P partition totals (P ≈ thousands of
   longs — trivially driver-safe at any corpus size);
5. phase B: one Arrow-batched ``mapInPandas`` pass computes the running
   local sum per partition and adds the broadcast partition offset —
   vectorized ``cumsum``, zero additional shuffle.

Total cost: one repartition exchange + one linear pass. No stage ever
sees more than one partition's rows or more than P scalars.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (the corpus' cheap length proxy).

    NULL text counts as 0 tokens (``F.size`` of a null array is -1 in
    non-ANSI mode, which would silently shift every later doc's global
    offset); the oracle mirrors this with ``COALESCE(..., 0)``.
    """
    n = F.size(F.filter(F.split(text, " "), lambda x: x != ""))
    return F.when(text.isNull(), F.lit(0)).otherwise(n).cast("long")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    count_col: str | None = None,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global offsets + sequence ids for packing docs into ``seq_len`` runs.

    Output (one row per doc): ``id, n_tokens, start_offset, seq_id,
    pos_in_seq, n_spans`` where ``seq_id = start_offset // seq_len``,
    ``pos_in_seq = start_offset % seq_len`` and ``n_spans`` is how many
    sequences the document straddles. Deterministic for any partitioning:
    offsets depend only on the global ``id_col`` order, never on where
    range boundaries land.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    n_tok = (
        F.col(count_col).cast("long")
        if count_col
        else ws_token_count(F.col(text_col))
    )
    slim = df.select(F.col(id_col).alias("__id"), n_tok.alias("n_tokens"))
    p = num_partitions or slim.sparkSession.sparkContext.defaultParallelism
    part = (
        slim.repartitionByRange(p, "__id")
        .sortWithinPartitions("__id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = {
        r["__pid"]: r["tot"]
        for r in part.groupBy("__pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None  # partition-local running total; seeded on first batch
        for b in batches:
            if not len(b):
                continue
            if run is None:
                run = int(offsets.get(int(b["__pid"].iloc[0]), 0))
            ends = b["n_tokens"].cumsum() + run
            start = ends - b["n_tokens"]
            run = int(ends.iloc[-1])
            yield pd.DataFrame(
                {"__id": b["__id"], "n_tokens": b["n_tokens"], "start_offset": start}
            )

    id_type = dict(zip(part.schema.names, part.schema))["__id"].dataType.simpleString()
    scanned = part.mapInPandas(
        scan, schema=f"__id {id_type}, n_tokens long, start_offset long"
    )
    start = F.col("start_offset")
    end_last = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return scanned.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "start_offset",
        F.floor(start / seq_len).cast("long").alias("seq_id"),
        (start % seq_len).cast("long").alias("pos_in_seq"),
        (F.floor(end_last / seq_len) - F.floor(start / seq_len) + 1)
        .cast("long")
        .alias("n_spans"),
    )
