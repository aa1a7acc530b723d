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
    math; one fold per plane, whole-stage codegen'd)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(F.zip_with(vec, lits, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(0)
    return bucket


def ann_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_planes: int = 8,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket, re-ranked by exact cosine.

    Output: (id_a, id_b, bucket, cosine) with id_a < id_b.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    b = df.select(
        F.col(id_col), F.col(vec_col), norm.alias("nrm"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
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
