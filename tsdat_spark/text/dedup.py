"""Near-duplicate detection: MinHash + LSH banding, SimHash, n-gram Jaccard.

Scale design (the 100 TB path):

- **MinHash + LSH** (Broder 1997; Leskovec et al., "Mining of Massive
  Datasets" ch. 3): per doc, k hash functions over token-shingle hashes →
  signature; signatures cut into b bands of r rows; docs sharing a band
  bucket are candidate pairs. Cost: one narrow map per doc + one groupBy on
  band keys — candidate generation never compares all pairs (the
  all-pairs Jaccard join is provided for small verification sets only).
- **SimHash** (Charikar 2002): sign-sum of per-token hash bits → one int
  per doc; near-dups differ in ≤h bits, found by banding the bits.

Everything is deterministic integer arithmetic expressible BOTH as Spark
column expressions and in ANSI-ish SQL, so DuckDB oracles can verify it
exactly:

    H(s)        = fold over chars: h ← (h·31 + ord(c)) mod 1_000_000_007, h₀=7
    minhash_i   = min over shingles of (aᵢ·H + bᵢ) mod 2_147_483_647,
                  aᵢ = 2i+1, bᵢ = 7919·i + 13
    simhash bit j = 1 iff Σ_tokens (±1 by bit j of H(token)) > 0

All JVM-side (higher-order array functions, whole-stage codegen) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
MH_MOD = 2_147_483_647


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def char_hash(s: Column) -> Column:
    """Polynomial rolling hash over character codes (see module docstring)."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(7).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles; docs with < n tokens get one whole-text shingle."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(df: DataFrame, text_col: str = "text", k: int = 16, n: int = 3) -> DataFrame:
    """Append mh0..mh{k-1} minhash columns.

    The shingle hashes land in ONE intermediate column that the k minhash
    expressions reference — shingling + per-character hashing (the O(doc
    length) part) is evaluated once per row, and the k permutation-min
    passes are cheap O(#shingles) folds over the cached array. Building k
    independent expression trees instead evaluated the whole char-hash
    pipeline k times per row (Catalyst can't CSE across separate
    higher-order lambda trees): measured 16x work in the sf0.1 bench
    (`lsh_pairs` ~195 s → the fix collapses it to one hashing pass).
    CollapseProject leaves the intermediate un-inlined because it is
    expensive and referenced k times (SPARK-36718 rule)."""
    hs = F.transform(shingles(F.col(text_col), n), char_hash)
    out = df.withColumn("__hs", hs)

    def _mh(a: int, b: int):
        # NB: Spark infers higher-order-function arity from the Python
        # lambda signature, so constants must be closed over via an outer
        # factory, never as default args.
        return lambda h: (F.lit(a) * h + F.lit(b)) % MH_MOD

    for i in range(k):
        out = out.withColumn(
            f"mh{i}",
            F.array_min(F.transform(F.col("__hs"), _mh(2 * i + 1, 7919 * i + 13))),
        )
    return out.drop("__hs")


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4
) -> DataFrame:
    """Candidate near-dup pairs from banded signatures.

    One explode (bands per doc) + one self-equi-join on the band key —
    shuffle size O(docs·bands), never O(docs²)."""
    rows = k // bands
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.concat_ws("_", *[F.col(f"mh{j * rows + r}") for r in range(rows)]).alias("key"),
        )
        for j in range(bands)
    ])
    banded = sig_df.select(id_col, F.explode(band_structs).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, ["band", "key"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16, out_col: str = "simhash") -> DataFrame:
    """Sign-sum simhash over token hashes (see module docstring).

    Token hashes are materialized once in an intermediate column; the
    per-bit sign-sum folds reference it (same k-fold re-evaluation hazard
    as ``minhash_signature`` — k independent aggregate trees over the raw
    expression would re-run the char-hash pipeline k times per row)."""
    out = df.withColumn("__th", F.transform(tokens(F.col(text_col)), char_hash))
    hs = F.col("__th")

    def _sign_sum(mask: int):
        return lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1)

    bit_cols = []
    for j in range(bits):
        contrib = F.aggregate(hs, F.lit(0).cast("long"), _sign_sum(1 << j))
        bit_cols.append(F.when(contrib > 0, F.lit(1 << j)).otherwise(0))
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return out.withColumn(out_col, total.cast("long")).drop("__th")


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs within a blocking key (verification /
    small-set path; LSH is the scale path)."""
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    )
    join_keys = [block_col] if block_col else []
    l = base.alias("l")
    r = base.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    joined = l.join(r, join_keys, "inner").where(cond) if join_keys else l.crossJoin(r).where(cond)
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = inter.cast("double") / union
    out = joined.select(
        F.col(f"l.{id_col}").alias("doc_a"),
        F.col(f"r.{id_col}").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )
    return out.where(F.col("jaccard") >= threshold) if threshold > 0 else out


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every token n-gram, slide a window of ``window``
    hashes, keep the minimum of each window; the distinct selected hashes
    are the document's fingerprint set (guaranteed to catch any shared
    substring of >= window+n-1 tokens between documents).

    One codegen'd map per doc (higher-order functions over the shingle-hash
    array) + an explode — no shuffle until the caller aggregates or joins
    fingerprints. Docs shorter than the window yield one whole-doc window.
    """
    # materialize the hash array behind a projection boundary: referencing
    # the raw expression inside the window lambda would re-evaluate the
    # whole shingle+hash pipeline per window index (O(len²·hash))
    hashed = df.select(F.col(id_col), F.transform(shingles(F.col(text_col), n), char_hash).alias("__hs"))
    hs = F.col("__hs")
    m = F.size(hs)
    win_min = F.transform(
        F.sequence(F.lit(1), F.greatest(m - window + 1, F.lit(1))),
        lambda i: F.array_min(F.slice(hs, i, window)),
    )
    return hashed.select(F.col(id_col), F.explode(F.array_distinct(win_min)).alias("fingerprint"))
