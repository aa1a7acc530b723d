"""Bloom-prefiltered incremental deduplication against a seen corpus.

Production training-data pipelines dedup each NEW crawl batch against
everything already ingested. A join of the new batch against a 100 TB
historical key set shuffles both sides; the standard fix (used by CCNet's
hash-split dedup and most crawl pipelines) is a Bloom filter over the
historical keys:

1. **Build** — one linear scan of the historical side. Each partition sets
   bits in a local numpy bitmap (``mapInArrow``, k indices per key via
   double hashing ``(h1 + i*h2) mod m`` — Kirsch & Mitzenmacher 2006 — on
   two JVM-computed ``xxhash64`` seeds); the driver ORs the P partition
   bitmaps. Driver traffic is ``P * m/8`` bytes (bitmaps, never keys);
   at 1000 executors and a 1 GiB filter, coalesce the bitmap stage or OR
   in two levels — the knob is ``build_partitions``.
2. **Probe** — the new batch tests membership map-side (Arrow-batched
   pandas UDF over the broadcast bitmap, vectorized fancy indexing).
   Bloom-NEGATIVE rows are *definitely unseen* and pass through with no
   shuffle at all — at a 1% false-positive rate that is ~99% of a mostly
   -novel crawl.
3. **Confirm** — only bloom-POSITIVE candidates (true hits + false
   positives) join the historical keys exactly (left-anti). The result is
   therefore EXACT — identical to the full anti-join — while the join's
   left side shrank from |new| to |candidates|.

Sizing: ``n_bits ~= -n*ln(p)/ln(2)^2`` for capacity ``n`` at false-positive
rate ``p``; ``n_hashes ~= (n_bits/n)*ln(2)``. The defaults (2^20 bits,
5 hashes) hold ~145k keys at p<=1%.

All hash computation is JVM-side (``xxhash64``); Python only performs the
bitmap scatter/gather on Arrow batches. Signed→unsigned reinterpretation
is explicit (numpy ``view('uint64')``) so Python and JVM agree on the
modulus.

Reference analog: tsdat's ``modified_since`` incremental fetch
(tsdat/io/storage/file_system.py) skips *files*; this skips *records* —
same incremental-ingest contract at record granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H2_SEED = 0x9E3779B9  # arbitrary fixed salt for the second hash


def _hash_cols(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of ``key`` (JVM-side xxhash64)."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(_H2_SEED))


def _bit_indices(h1: np.ndarray, h2: np.ndarray, n_hashes: int, n_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing, vectorized."""
    u1 = h1.view("uint64")[:, None]
    u2 = h2.view("uint64")[:, None]
    i = np.arange(1, n_hashes + 1, dtype=np.uint64)[None, :]
    return ((u1 + i * u2) % np.uint64(n_bits)).astype(np.int64)


def build_bloom(
    df: DataFrame,
    key: Column,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    build_partitions: int | None = None,
) -> bytes:
    """One-pass Bloom filter over ``key`` of every row of ``df``.

    Returns the ``n_bits/8``-byte bitmap (driver-held; broadcast it for
    probing). ``build_partitions`` caps how many partition bitmaps reach
    the driver (``P * n_bits/8`` bytes).
    """
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    h1, h2 = _hash_cols(key)
    hashed = df.select(h1.alias("h1"), h2.alias("h2"))
    if build_partitions is not None:
        hashed = hashed.coalesce(build_partitions)

    nb, nh = n_bits, n_hashes

    def to_bitmap(batches):
        bitmap = np.zeros(nb // 8, dtype=np.uint8)
        import pyarrow as pa

        for batch in batches:
            pdf = batch.to_pandas()
            if len(pdf):
                idx = _bit_indices(
                    pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), nh, nb
                ).ravel()
                np.bitwise_or.at(bitmap, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        yield pa.RecordBatch.from_pydict({"bm": [bitmap.tobytes()]})

    parts = hashed.mapInArrow(to_bitmap, "bm binary").collect()
    out = np.zeros(nb // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out.tobytes()


def bloom_contains(
    df: DataFrame,
    key: Column,
    bitmap,
    n_hashes: int = 5,
    flag_col: str = "__bloom_hit",
) -> DataFrame:
    """Append a boolean membership column (no false negatives).

    ``bitmap`` may be raw ``bytes`` (broadcast here, one-shot callers) or
    an already-created ``pyspark.Broadcast`` of the bytes — long-running
    callers (``streaming.history_dedup_sink``) own the broadcast lifecycle
    and reuse/unpersist it across micro-batches instead of leaking one
    n_bits/8-byte broadcast per batch (round-7 fix, ADVICE r6)."""
    from pyspark.broadcast import Broadcast

    if isinstance(bitmap, Broadcast):
        bc = bitmap
        n_bits = len(bc.value) * 8
    else:
        n_bits = len(bitmap) * 8
        bc = df.sparkSession.sparkContext.broadcast(bitmap)
    nh = n_hashes

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(h1):
            return pd.Series([], dtype=bool)
        idx = _bit_indices(h1.to_numpy(np.int64), h2.to_numpy(np.int64), nh, n_bits)
        hit = ((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).all(axis=1)
        return pd.Series(hit)

    h1, h2 = _hash_cols(key)
    return df.withColumn(flag_col, probe(h1, h2))


def bloom_dedup(
    new_df: DataFrame,
    hist_df: DataFrame,
    key: Column,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key`` appears nowhere in ``hist_df``.

    EXACT (equals the anti-join): the Bloom filter only *prefilters* —
    negatives skip the join entirely, positives are confirmed with a
    left-anti join against the (distinct) historical keys. Output keeps
    ``new_df``'s columns.
    """
    bitmap = build_bloom(hist_df, key, n_bits=n_bits, n_hashes=n_hashes)
    flagged = bloom_contains(new_df, key, bitmap, n_hashes=n_hashes)
    definite_new = flagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    hist_keys = hist_df.select(key.alias("__k")).distinct()
    confirmed_new = candidates.join(
        hist_keys, on=key == F.col("__k"), how="left_anti"
    )
    return definite_new.unionByName(confirmed_new)
