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

All JVM-side — no Python in the hot path.

Round-7 hot-path note (guide §4.1/§1.2): higher-order-function lambdas are
evaluated interpreted and Catalyst does not hoist loop-invariant
subexpressions out of a lambda body, so the original
``element_at(filter(split(text)), i+j)`` inside the shingle ``transform``
re-tokenized the WHOLE document once per referenced element (~3·n_shingles
re-tokenizations per doc — the dominant cost of every shingle consumer at
sf1.0). Two changes, both bit-identical by construction:

1. the token array is materialized once per row behind a projection
   boundary (CollapseProject keeps a non-cheap multiply-referenced alias
   un-inlined — the same SPARK-36718 property ``minhash_signature`` already
   relied on for its ``__hs`` column);
2. shingle hashes are COMPOSED from per-token partial hashes instead of
   hashing the concatenated shingle string: the rolling hash is
   ``H_acc(s) = (acc·31^len(s) + G(s)) mod M`` with ``G`` the fold from 0,
   so per-token ``(P, G) = (31^len mod M, G mod M)`` computed once per doc
   combine into every shingle in O(n) long multiplications — no shingle
   string is ever built and each character is hashed exactly once
   (previously once per covering shingle). ``tests/test_retrieval.py``
   pins new == old on the real corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
MH_MOD = 2_147_483_647

#: char_hash("") — split("", "") is [""] and ascii("") is 0, so the fold
#: performs one step: (7·31 + 0) mod M. Pinned for the empty-token-array
#: shingle composition (tests assert it against char_hash on a live session).
EMPTY_HASH = 7 * 31


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def _tokens_safe(text: Column) -> Column:
    """NULL text → empty token array, so the PG composition's k==0 branch
    reproduces char_hash of the whole-text shingle "" (the old
    ``shingles()`` path: concat_ws over a NULL array is also "")."""
    return F.coalesce(tokens(text), F.array().cast("array<string>"))


def char_hash(s: Column) -> Column:
    """Polynomial rolling hash over character codes (see module docstring)."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(7).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles; docs with < n tokens get one whole-text shingle.

    NOTE (perf): referencing this expression repeatedly — or at all inside
    another lambda — re-evaluates the tokenization per element (see module
    docstring). Hot paths should materialize ``tokens(text)`` in a column
    first and call :func:`shingles_of_tokens` on it.
    """
    return shingles_of_tokens(tokens(text), n)


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Token n-gram shingles over an ALREADY-MATERIALIZED token array
    column (O(1) ``element_at`` per reference instead of a re-tokenization)."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def token_pg(toks: Column) -> Column:
    """Per-token partial hashes: array of struct(p = 31^len(t) mod M,
    g = fold-from-0 char hash of t). One char pass per document; every
    shingle/token hash downstream is O(1) long arithmetic per token."""
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.split(t, ""),
            F.struct(F.lit(1).cast("long").alias("p"), F.lit(0).cast("long").alias("g")),
            lambda acc, ch: F.struct(
                ((acc["p"] * 31) % MOD).alias("p"),
                ((acc["g"] * 31 + F.ascii(ch)) % MOD).alias("g"),
            ),
        ),
    )


def _pg_append(acc: Column, pg: Column) -> Column:
    """acc ← (acc·P(tok) + G(tok)) mod M — append one token to the rolling
    hash. acc < M and P < M keep the product under 2⁶³."""
    return (acc * pg["p"] + pg["g"]) % MOD


def _pg_space(acc: Column) -> Column:
    """acc ← (acc·31 + 32) mod M — append one ' ' (ascii 32)."""
    return (acc * 31 + 32) % MOD


def shingle_hashes_pg(pg: Column, n: int = 3) -> Column:
    """``transform(shingles_of_tokens(toks, n), char_hash)`` computed
    compositionally from :func:`token_pg` output — bit-identical, no
    shingle strings, each char hashed once (see module docstring)."""
    k = F.size(pg)

    def gram_hash(i: Column) -> Column:
        acc = F.lit(7).cast("long")
        for j in range(n):
            if j:
                acc = _pg_space(acc)
            acc = _pg_append(acc, F.element_at(pg, i + j))
        return acc

    grams = F.transform(F.sequence(F.lit(1), k - (n - 1)), gram_hash)
    # < n tokens → hash of the whole-text shingle " ".join(toks); the
    # aggregate threads (hash, is_first) so no leading space is appended.
    # Zero tokens → concat_ws(" ", []) == "" whose char_hash is EMPTY_HASH
    # (split("", "") == [""], ascii("") == 0).
    whole = F.when(k == 0, F.lit(EMPTY_HASH).cast("long")).otherwise(
        F.aggregate(
            pg,
            F.struct(F.lit(7).cast("long").alias("h"), F.lit(1).alias("first")),
            lambda acc, t: F.struct(
                _pg_append(
                    F.when(acc["first"] == 1, acc["h"]).otherwise(_pg_space(acc["h"])), t
                ).alias("h"),
                F.lit(0).alias("first"),
            ),
            lambda acc: acc["h"],
        )
    )
    return F.when(k >= n, grams).otherwise(F.array(whole))


def token_hashes_pg(pg: Column) -> Column:
    """``transform(toks, char_hash)`` from :func:`token_pg` output:
    H(t) = (7·P(t) + G(t)) mod M."""
    return F.transform(pg, lambda t: _pg_append(F.lit(7).cast("long"), t))


def minhash_signature(df: DataFrame, text_col: str = "text", k: int = 16, n: int = 3) -> DataFrame:
    """Append mh0..mh{k-1} minhash columns.

    The shingle hashes land in ONE intermediate column that the k minhash
    expressions reference — tokenization and per-character hashing (the
    O(doc length) part) run once per row (token array → per-token partial
    hashes → composed shingle hashes, each a materialized column; see
    module docstring), and the k permutation-min passes are cheap
    O(#shingles) folds over the cached array. Building k independent
    expression trees instead evaluated the whole char-hash pipeline k times
    per row (Catalyst can't CSE across separate higher-order lambda trees):
    measured 16x work in the sf0.1 bench (`lsh_pairs` ~195 s → the fix
    collapses it to one hashing pass). CollapseProject leaves the
    intermediates un-inlined because they are expensive and referenced
    multiple times (SPARK-36718 rule)."""
    out = (
        df.withColumn("__tk", _tokens_safe(F.col(text_col)))
        .withColumn("__pg", token_pg(F.col("__tk")))
        .withColumn("__hs", shingle_hashes_pg(F.col("__pg"), n))
    )

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
    return out.drop("__tk", "__pg", "__hs")


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4
) -> DataFrame:
    """Candidate near-dup pairs from banded signatures.

    One explode (bands per doc) + one self-equi-join on the band key —
    shuffle size O(docs·bands), never O(docs²)."""
    rows = k // bands
    # materialize the signature columns first (round 7): the band explode's
    # inferred size()>0 filter and the band-key equi-join otherwise push
    # predicates below the projection chain, inlining the whole
    # minhash pipeline (tokenize + per-token hash + k folds) into re-
    # evaluated filter expressions on BOTH join sides
    sig_df = sig_df.select(id_col, *[f"mh{i}" for i in range(k)]).localCheckpoint(eager=False)
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
    out = df.withColumn(
        "__th", token_hashes_pg(token_pg(_tokens_safe(F.col(text_col))))
    )
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
    small-set path; LSH is the scale path).

    Round-7 shape (guide §2.3, §3.3, §8): the previous form carried full
    shingle-string ARRAYS through the block self-join and evaluated
    ``array_intersect``/``array_union`` per pair — O(pairs · doc_len) work
    with the heavy arrays crossing the join (86 s at sf1.0, 62.5M pairs).
    Now every per-pair step is O(1):

    1. ``|A∩B|`` from an exploded-shingle equi-join + count. Work is
       Σ_g df(g)² over distinct (block, shingle) — df is bounded in real
       corpora (max 19 at sf1.0), so no hot-key fan-out; keys are strings,
       equality exact.
    2. the all-pairs frame from ``(id, |A|)`` proxy rows only (~16 bytes),
       via a broadcast block-equi join — the payload-vs-proxy split of
       guide §8.
    3. ``|A∪B| = |A|+|B|−|A∩B|`` (per-doc shingles are distinct) and the
       rounded division, attaching |A∩B| with a SHUFFLE_HASH left join
       (narrow rows; no sort, no broadcast-size cliff at larger inputs;
       pairs sharing no shingle get NULL→0).

    Bit-identical to the old form: same distinct shingle strings, same
    integer counts, same double division/round.
    """
    blocks = [block_col] if block_col else []
    base = df.select(
        F.col(id_col),
        *[F.col(b) for b in blocks],
        tokens(F.col(text_col)).alias("__tk"),
    ).select(
        F.col(id_col),
        *[F.col(b) for b in blocks],
        F.array_distinct(shingles_of_tokens(F.col("__tk"), n)).alias("sh"),
    )
    # checkpoint the shingle arrays: three consumers (sizes + both explode
    # sides) read them, and — decisive — InferFiltersFromGenerate otherwise
    # plants a `size(sh) > 0` filter under the explode whose expression is
    # the FULLY INLINED shingle pipeline (element_at(filter(split(text)))
    # re-tokenizes the doc per element, interpreted): measured 47 s of the
    # old 86 s at sf1.0 in that one inferred filter. The barrier makes the
    # inferred filter a cheap size() over a materialized array.
    base = base.localCheckpoint(eager=False)
    sizes = base.select(
        F.col(id_col), *[F.col(b) for b in blocks], F.size("sh").alias("__nsh")
    )
    ex = base.select(F.col(id_col), *[F.col(b) for b in blocks], F.explode("sh").alias("__g"))
    gl, gr = ex.alias("gl"), ex.alias("gr")
    # pre-partition BOTH final-join inputs on the leading key doc_a: with
    # spark.sql.requireAllClusterKeysForCoPartition=false (session.py) the
    # left-outer join below accepts this subset co-partitioning, so the
    # all-pairs stream — by far the widest frame in the query — is never
    # exchanged (guide §2.4; measured 10.1 -> 7.7 s warm at sf1.0). The
    # repartition width tracks the session shuffle-partition setting.
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # SHUFFLE_HASH: the exploded sides are uniform-ish (block, shingle)
    # keys; building one side's partition as a hash table beats sorting
    # both 2.6M-row string-keyed sides (3.3 -> 1.2 s warm at sf1.0);
    # partition volume tracks the shuffle-partition setting at scale
    inter = (
        gl.join(gr.hint("shuffle_hash"), [*blocks, "__g"])
        .where(F.col(f"gl.{id_col}") < F.col(f"gr.{id_col}"))
        .select(
            F.col(f"gl.{id_col}").alias("doc_a"),
            F.col(f"gr.{id_col}").alias("doc_b"),
        )
        .repartition(n_shuffle, "doc_a")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("__ni"))
    )
    # score the INTERSECTING pairs before the all-pairs join: Spark's
    # round() on double allocates a BigDecimal per row (round-half-up on
    # the shortest decimal representation), which measured ~6 s of the
    # final stage at sf1.0 when evaluated over all 62.5M pairs — but
    # zero-overlap pairs need no arithmetic at all, because
    # round(0/|A∪B|, 6) is exactly 0.0. So the division+round runs only
    # over the ~1% of pairs that share a shingle (attached to their sizes
    # by two doc-grain joins), and the all-pairs stream — now just
    # (doc_a, doc_b) proxy rows — takes a coalesce(jaccard, 0.0).
    # Bit-identical: the nonzero branch is the same expression over the
    # same doubles, and Round(0.0, 6) == 0.0 exactly.
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("__nsh").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("__nsh").alias("__nb"))
    ni = F.col("__ni")
    jac = ni.cast("double") / (F.col("__na") + F.col("__nb") - ni)
    # sizes attach broadcast (doc-grain, same bound as the pair-frame
    # broadcast below) so inter keeps its doc_a partitioning and the
    # final join stays exchange-free on the pair stream
    inter_scored = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("__j"))
    )
    ids = base.select(F.col(id_col), *[F.col(b) for b in blocks])
    l, r = ids.repartition(n_shuffle, id_col).alias("l"), ids.alias("r")
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    joined = (
        l.join(F.broadcast(r), blocks, "inner").where(cond)
        if blocks
        else l.crossJoin(F.broadcast(r)).where(cond)
    )
    pairs = joined.select(
        F.col(f"l.{id_col}").alias("doc_a"),
        F.col(f"r.{id_col}").alias("doc_b"),
    )
    out = pairs.join(inter_scored.hint("shuffle_hash"), ["doc_a", "doc_b"], "left")
    out = out.select("doc_a", "doc_b", F.coalesce("__j", F.lit(0.0)).alias("jaccard"))
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
    # materialize tokens → per-token partial hashes → shingle hashes, each
    # behind a projection boundary: referencing the raw expressions inside
    # the window lambda would re-evaluate the whole tokenize+hash pipeline
    # per window index (O(len²·hash))
    hashed = (
        df.withColumn("__tk", _tokens_safe(F.col(text_col)))
        .withColumn("__pg", token_pg(F.col("__tk")))
        .select(F.col(id_col), shingle_hashes_pg(F.col("__pg"), n).alias("__hs"))
    )
    hs = F.col("__hs")
    m = F.size(hs)
    win_min = F.transform(
        F.sequence(F.lit(1), F.greatest(m - window + 1, F.lit(1))),
        lambda i: F.array_min(F.slice(hs, i, window)),
    )
    return hashed.select(F.col(id_col), F.explode(F.array_distinct(win_min)).alias("fingerprint"))
