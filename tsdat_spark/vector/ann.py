"""Random-hyperplane LSH for approximate nearest neighbors (cosine).

Charikar (STOC 2002) sign-random-projection: a vector's bucket is the
sign pattern of its dot products with ``n_planes`` fixed random
hyperplanes; vectors with high cosine similarity collide with probability
1 − θ/π per plane. Candidate pairs come from an equi-join on the bucket id
(shuffle O(n) on bucket keys, never O(n²)); exact cosine re-ranks the
candidates.

Determinism: the plane matrix is seeded numpy, embedded as literal columns
in the Spark plan and as literal lists in the DuckDB oracle — both engines
fold the same doubles in the same order.

At 100 TB the bucketed join is the whole point: the brute-force baseline
(queries.q_knn_cosine) scans all pairs; this path scans only same-bucket
pairs, and multiple independent tables (plane sets) trade recall for cost.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_SEED = 7


def hyperplanes(dim: int, n_planes: int, seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic ±1 plane matrix (n_planes × dim)."""
    rng = np.random.RandomState(seed)
    return rng.choice(np.array([-1.0, 1.0]), size=(n_planes, dim))


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id: Σ_j 2^j · [dot(v, plane_j) > 0] as a long (pure column
    math; one fold per plane, whole-stage codegen'd). The plane matrix is
    embedded as ONE SQL literal (an array of (weight-array, 2^j) structs)
    folded with a single aggregate program — per-weight ``F.lit`` calls
    each pay a py4j round trip, which dominated plan build at
    n_planes·dim literals (same fix as ``ivf_assign_expr``)."""
    items = ",".join(
        "named_struct('w',array({w}),'bit',{bit}L)".format(
            w=",".join(f"{float(x)!r}D" for x in plane), bit=1 << j
        )
        for j, plane in enumerate(planes)
    )
    tbl = F.expr(f"array({items})")

    def add_plane(acc, p):
        dot = F.aggregate(F.zip_with(vec, p["w"], lambda a, b: a * b),
                          F.lit(0.0), lambda a, x: a + x)
        return acc + F.when(dot > 0, p["bit"]).otherwise(F.lit(0).cast("long"))

    return F.aggregate(tbl, F.lit(0).cast("long"), add_plane)


def _cos(vec_a: Column, vec_b: Column, nrm_a: Column, nrm_b: Column) -> Column:
    dot = F.aggregate(F.zip_with(vec_a, vec_b, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    return dot / (nrm_a * nrm_b)


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def collect_centroids(df: DataFrame, n: int, id_col: str = "vec_id", vec_col: str = "v"):
    """Deterministic coarse-quantizer 'training' stand-in: the n lowest-id
    vectors ARE the centroids, collected to the driver as (id, vector)
    pairs. A production deployment would k-means these (Spark MLlib KMeans
    over a sample); the IVF *layout* — the part that matters for the query
    plan — is identical either way, and lowest-id selection keeps the whole
    pipeline oracle-reproducible in ANSI SQL. Centroid count is O(sqrt(n))
    even at billions of vectors, so driver collection is always cheap."""
    import math

    rows = df.orderBy(id_col).limit(n).select(id_col, vec_col).collect()
    cents = [(int(r[0]), [float(x) for x in r[1]]) for r in rows]
    for cid, cv in cents:
        if not all(math.isfinite(x) for x in cv):
            # caught here, next to the data, instead of as an unparseable
            # 'nanD' literal deep inside F.expr (ivf_assign_expr) or a
            # silently-NaN assignment (ivf_assign_matmul)
            raise ValueError(f"centroid vector {cid} contains non-finite components")
    return cents


def kmeans_centroids(
    df: DataFrame,
    n: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list:
    """Trained coarse quantizer: seeded fixed-iteration SPHERICAL k-means
    (Lloyd's on the unit sphere — centroids are normalized means, matching
    the cosine metric every consumer of the centroid list uses).

    Deterministic by construction: init = the ``n`` lowest-id vectors
    (exactly :func:`collect_centroids`, the oracle-replayable default),
    then ``n_iter`` Lloyd rounds — no RNG, no convergence test, so two
    runs on the same table produce identical centroids. Returns the same
    ``[(centroid_id, vector)]`` shape as :func:`collect_centroids` with
    ids 0..n-1, drop-in for :func:`ivf_assign` / :func:`ivf_search`.

    Scale shape per round: assignment is the zero-shuffle GEMM map
    (:func:`ivf_assign_matmul`'s kernel inlined), and the update is a
    per-partition partial (sum-vector, count) reduce — partitions × n tiny
    rows to the driver, never the vectors themselves. Empty cells keep
    their previous centroid (the standard Lloyd fallback)."""
    import pandas as pd

    init = collect_centroids(df, n, id_col=id_col, vec_col=vec_col)
    C = np.array([cv for _, cv in init], dtype="float64")
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    n_cells, dim = C.shape
    src = df.select(vec_col)

    schema = "cid long, cnt long, s binary"

    for _ in range(n_iter):
        Cn = C  # closure snapshot for this round

        def partials(batches, Cn=Cn):
            acc = np.zeros((n_cells, dim))
            cnt = np.zeros(n_cells, dtype="int64")
            for pdf in batches:
                V = np.array(pdf[vec_col].tolist(), dtype="float64")
                if not len(V):
                    continue
                nrm = np.linalg.norm(V, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                best = ((V / nrm) @ Cn.T).argmax(axis=1)
                np.add.at(acc, best, V / nrm)
                cnt += np.bincount(best, minlength=n_cells)
            live = np.flatnonzero(cnt)
            yield pd.DataFrame({
                "cid": live,
                "cnt": cnt[live],
                "s": [acc[i].tobytes() for i in live],
            })

        rows = src.mapInPandas(partials, schema).collect()
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells, dtype="int64")
        for r in rows:
            sums[r["cid"]] += np.frombuffer(r["s"], dtype="float64")
            counts[r["cid"]] += r["cnt"]
        live = counts > 0
        means = sums[live] / counts[live, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        C = C.copy()
        C[live] = means / norms
    return [(i, [float(x) for x in C[i]]) for i in range(n_cells)]


def ivf_assign_expr(vec: Column, nrm: Column, centroids) -> Column:
    """Nearest-centroid assignment as a PURE MAP expression (no join, no
    shuffle): the centroid list is embedded as literal arrays and the
    argmax is an ``array_max`` over (cos, -centroid_id) structs — highest
    cosine, ties to lowest centroid id. Returns a struct column with
    fields ``centroid_id`` and ``cos``.

    This is the scale-correct IVF shape: assignment rides inside the scan
    stage (whole-stage codegen), preserving the input partitioning for the
    downstream cell-local search — nothing about the big side ever
    shuffles. The expression PROGRAM is flat in n_cells (one transform/fold
    over a single literal array — measured flat plan-build 16→256 cells);
    only the literal payload (n_cells·dim doubles) grows. Once that payload
    is large (thousands of cells — IVF list counts at billion-vector scale
    are 4k-64k) the per-row interpreted fold loses to one GEMM per Arrow
    batch: use :func:`ivf_assign_matmul` there (same semantics, same
    zero-shuffle shape).
    """
    import math

    # ONE literal array of (neg_id, cv, cnrm) structs + ONE transform/fold
    # program over it — the scoring expression appears once in the plan
    # instead of once per centroid, so analysis/codegen cost is flat in
    # n_cells (only the literal data grows). Semantics are identical to the
    # unrolled form: same sequential zip_with/aggregate fold per centroid,
    # same (cos, -id) struct-max tie-break.
    # The literal is assembled as ONE SQL expression string: n_cells·dim
    # separate F.lit() calls would each pay a py4j round trip (the measured
    # dominant cost at 1000+ literals). repr(float) round-trips the exact
    # double through Spark's SQL parser, so values are bit-identical to the
    # F.lit form.
    items = ",".join(
        "named_struct('neg_id',{neg}L,'cv',array({cv}),'cnrm',{cn}D)".format(
            neg=-cid,
            cv=",".join(f"{float(x)!r}D" for x in cv),
            cn=repr(math.sqrt(sum(x * x for x in cv))),
        )
        for cid, cv in sorted(centroids)
    )
    cent = F.expr(f"array({items})")

    def score(c):
        dot = F.aggregate(
            F.zip_with(vec, c["cv"], lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
        return F.struct((dot / (nrm * c["cnrm"])).alias("cos"), c["neg_id"].alias("neg_id"))

    best = F.array_max(F.transform(cent, score))
    return F.struct((-best["neg_id"]).alias("centroid_id"), best["cos"].alias("cos"))


def ivf_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "v",
    method: str = "auto",
) -> DataFrame:
    """IVF coarse quantization: one row per vector with its nearest
    centroid by cosine (ties → lowest centroid id). ``centroids`` is the
    driver-side list from :func:`collect_centroids` or
    :func:`kmeans_centroids`. Map-only plan — see :func:`ivf_assign_expr`.

    ``method``: ``"expr"`` (literal-fold, bit-exact vs the SQL oracle),
    ``"matmul"`` (one GEMM per Arrow batch), or ``"auto"`` (default):
    expr up to 256 cells, matmul beyond — the measured crossover where the
    per-row interpreted fold loses to the GEMM and the single literal SQL
    expression (O(n_cells·dim) text) stops being free to analyze.
    Output: (id_col, centroid_id, cos)."""
    if method not in ("auto", "expr", "matmul"):
        raise ValueError(f"unknown ivf_assign method {method!r}")
    if method == "matmul" or (method == "auto" and len(centroids) > 256):
        return ivf_assign_matmul(df, centroids, id_col=id_col, vec_col=vec_col)
    e = df.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__nrm"))
    b = ivf_assign_expr(F.col(vec_col), F.col("__nrm"), centroids)
    return e.select(
        id_col,
        b["centroid_id"].alias("centroid_id"),
        F.round(b["cos"], 6).alias("cos"),
    )


def ivf_search(
    df: DataFrame,
    queries_df: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """IVF top-k cosine search: probe the ``nprobe`` nearest cells per
    query, exact re-rank within the probed cells (Jégou et al., PAMI 2011
    coarse-quantizer layout re-expressed as DataFrame ops).

    Scale shape: cell assignment of the big side is a zero-shuffle map
    (:func:`ivf_assign_expr`); queries (small) are assigned to their nprobe
    nearest cells and broadcast; candidates come from an equi-join on
    centroid_id against the map-side-assigned scan — candidate volume is
    ~nprobe/n_cells of the data instead of all of it, and the big side
    never shuffles (broadcast hash join on the cell key). With
    nprobe == n_cells this is exactly brute force (recall 1.0) — the
    correctness anchor the pytest uses.

    Output: (query_id, rank, neighbor_id, cosine), rank 1..k, ties →
    lowest neighbor id.
    """
    from pyspark.sql import Window as W

    e = df.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__nrm"))
    cells = e.withColumn(
        "centroid_id", ivf_assign_expr(F.col(vec_col), F.col("__nrm"), centroids)["centroid_id"]
    )
    # materialization barrier (round 7): the candidate join otherwise infers
    # an isnotnull(centroid_id) filter below this projection whose pushed
    # form INLINES the whole n_cells-fold assignment expression — every row
    # paid the assignment twice (4.9 s -> 1.1 s warm at sf1.0, 20k vectors)
    cells = cells.localCheckpoint(eager=False)

    q = queries_df.select(
        F.col(query_id_col), F.col(query_vec_col), _norm(F.col(query_vec_col)).alias("__qnrm")
    )
    # nprobe nearest cells per query: rank the per-centroid cosines of the
    # tiny query side (explode over literal centroid structs). The literal
    # array is ONE SQL expression string for the same reason as
    # ivf_assign_expr: per-double F.lit() calls pay a py4j round trip each
    # (n_cells·dim of them dominated this function's wall time).
    import math

    items = ",".join(
        "named_struct('centroid_id',{cid}L,'cv',array({cv}),'cnrm',{cn}D)".format(
            cid=cid,
            cv=",".join(f"{float(x)!r}D" for x in cv),
            cn=repr(math.sqrt(sum(x * x for x in cv))),
        )
        for cid, cv in sorted(centroids)
    )
    cent = F.expr(f"array({items})")
    qc = q.select(query_id_col, query_vec_col, "__qnrm", F.explode(cent).alias("c"))
    qcos = _cos(F.col(query_vec_col), F.col("c.cv"), F.col("__qnrm"), F.col("c.cnrm"))
    wq = W.partitionBy(query_id_col).orderBy(F.desc("__ccos"), F.col("centroid_id"))
    probes = (
        qc.select(query_id_col, query_vec_col, "__qnrm",
                  F.col("c.centroid_id").alias("centroid_id"), qcos.alias("__ccos"))
        .withColumn("__prank", F.row_number().over(wq))
        .where(F.col("__prank") <= nprobe)
        .drop("__ccos", "__prank")
    )

    cand = cells.join(F.broadcast(probes), "centroid_id").where(F.col(id_col) != F.col(query_id_col))
    cos = _cos(F.col(vec_col), F.col(query_vec_col), F.col("__nrm"), F.col("__qnrm"))
    return (
        cand.select(query_id_col, F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(W.partitionBy(query_id_col).orderBy(F.desc("cos"), "neighbor_id")))
        .where(F.col("rank") <= k)
        .select(query_id_col, F.col("rank").cast("int").alias("rank"), "neighbor_id", F.round("cos", 6).alias("cosine"))
    )


def ann_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_planes: int = 8,
    seed: int = LSH_SEED,
    dim: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket, re-ranked by exact cosine.

    Pass ``dim`` when known (it is part of the table's schema contract) to
    avoid the fallback ``first()`` probe job. For tunable recall use
    :func:`ann_lsh_pairs_multi` (OR-amplification across independent plane
    tables); this single-table form is its ``n_tables=1`` special case with
    the bucket id exposed.

    Output: (id_a, id_b, bucket, cosine) with id_a < id_b.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    b = df.select(
        F.col(id_col), F.col(vec_col), norm.alias("nrm"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    # barrier: the self-join consumes b twice and infers isnotnull(bucket)
    # filters that inline the n_planes-fold bucket expression — without it
    # every row pays the fold up to 4x (round 7, same fix as ivf_search)
    b = b.localCheckpoint(eager=False)
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(r, "bucket").where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    dot = F.aggregate(
        F.zip_with(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"), lambda a, b_: a * b_),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cos = dot / (F.col("l.nrm") * F.col("r.nrm"))
    return pairs.select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col("bucket"),
        F.round(cos, 6).alias("cosine"),
    )

def ann_lsh_pairs_multi(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = LSH_SEED,
    dim: int | None = None,
) -> DataFrame:
    """OR-amplified LSH candidate pairs: ``n_tables`` independent
    hyperplane tables (seeds ``seed, seed+1, …``); a pair is a candidate if
    it collides in ANY table. Collision probability per pair rises from
    p = (1 − θ/π)^n_planes to 1 − (1 − p)^T — the standard recall/cost
    knob missing from the single-table form: recall grows monotonically in
    T while candidate volume stays Σ_t same-bucket pairs (linear in T),
    never all-pairs.

    Plan shape (round 7, guide §8 proxy/payload split): ONE scan computes
    all T bucket ids as columns (each a codegen'd fold) and explodes them
    into a NARROW (id, table_id, bucket) frame — no vectors — that is
    checkpointed (so the fold runs once, not once per join side) and
    self-equi-joined on (table_id, bucket); the cross-table pair dedup is
    then a hash-aggregate ``distinct`` over 16-byte id pairs, and the full
    vectors attach to the surviving pairs afterwards via two id-keyed
    joins for the exact cosine re-rank. The previous form carried both
    vectors on every candidate row through the dedup, and because
    ``first(array<float>)`` cannot hash-aggregate, that dedup planned as
    partial-SortAggregate → Exchange → final-SortAggregate: every
    candidate pair sorted twice and shuffled once with ~1.1 KB of vector
    payload (measured 7.3 s → 2.6 s at sf1.0-scale, 20k vectors). All
    shuffles remain keyed and O(candidates) — but now at proxy width.

    Output: (id_a, id_b, cosine) with id_a < id_b (no bucket column — a
    pair may collide in several tables).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tables = F.array(*[
        F.struct(
            F.lit(t).alias("table_id"),
            lsh_bucket_col(F.col(vec_col), hyperplanes(dim, n_planes, seed + t)).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    buckets = df.select(F.col(id_col), F.explode(tables).alias("tb")).select(
        id_col, F.col("tb.table_id").alias("table_id"), F.col("tb.bucket").alias("bucket")
    )
    # barrier the NARROW frame only (id, table_id, bucket — ~24 B/row):
    # both join sides and the generate-inferred filters read materialized
    # longs instead of re-running the T-table fold; the earlier experiment
    # that measured a checkpoint here as a loss barriered the exploded
    # frame WITH its vectors (T copies of every vector), which is exactly
    # the payload/proxy mistake §8 warns about
    buckets = buckets.localCheckpoint(eager=False)
    l, r = buckets.alias("l"), buckets.alias("r")
    pairs = (
        l.join(r, ["table_id", "bucket"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    base = df.select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("nrm"))
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                    F.col("nrm").alias("na"))
    bb = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                     F.col("nrm").alias("nb"))
    cand = pairs.join(a, "id_a").join(bb, "id_b")
    cos = _cos(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return cand.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))


def ivf_assign_matmul(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Large-cell-count escalation of :func:`ivf_assign`: one numpy matmul
    per Arrow batch instead of n_cells literal expressions.

    Same zero-shuffle shape (mapInPandas rides inside the scan stage, input
    partitioning preserved), but batch cost is one (batch × dim)·(dim ×
    n_cells) GEMM — the right tool once n_cells outgrows expression codegen
    (~256+; IVF cell counts at billion-vector scale are 4k-64k). Ties →
    lowest centroid id (centroid columns are ordered by id, argmax takes
    the first maximum).

    Note: matmul sums in a different order than the sequential fold of
    :func:`ivf_assign_expr`, so cos can differ in the last ulp — use the
    expression path where bit-exact oracle parity matters; assignments
    agree except on exact ties (pytest-verified on real embeddings).
    Output: (id_col, centroid_id, cos) — cos rounded to 6, like ivf_assign.
    """
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)
    cids = np.array([c[0] for c in cents], dtype="int64")
    C = np.array([c[1] for c in cents], dtype="float64")          # (m, dim)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    schema = f"{id_col} long, centroid_id long, cos double"

    def fn(batches):
        for pdf in batches:
            V = np.array(pdf[vec_col].tolist(), dtype="float64")  # (b, dim)
            nrm = np.linalg.norm(V, axis=1, keepdims=True)
            cos = (V / nrm) @ Cn.T                                # (b, m)
            best = cos.argmax(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "centroid_id": cids[best],
                "cos": np.round(cos[np.arange(len(best)), best], 6),
            })

    return df.select(id_col, vec_col).mapInPandas(fn, schema)
