"""ANN LSH: bucket determinism, candidate recall vs brute force on real
embeddings."""

import pytest
from pyspark.sql import functions as F

from tsdat_spark.vector.ann import ann_lsh_pairs, hyperplanes

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    e.persist(); e.count()
    yield e
    e.unpersist()


def test_planes_deterministic():
    import numpy as np

    assert np.array_equal(hyperplanes(64, 8), hyperplanes(64, 8))
    assert set(np.unique(hyperplanes(16, 4))) == {-1.0, 1.0}


def test_buckets_partitioning_invariant(vecs):
    a = ann_lsh_pairs(vecs, n_planes=8).orderBy("id_a", "id_b").collect()
    b = ann_lsh_pairs(vecs.repartition(7), n_planes=8).orderBy("id_a", "id_b").collect()
    assert a == b
    assert len(a) > 0


def test_recall_of_top1_neighbors(vecs):
    """Sign-LSH collision probability is (1 - θ/π)^planes; these embeddings
    are near-random (top-1 cosine ≈ 0.4 → θ ≈ 66° → ≈ 0.63/plane), so with
    3 planes theory predicts ≈ 0.25 recall of true top-1 pairs. Assert a
    floor well below theory but far above chance (8 buckets → chance ≈
    1/8 per pair)."""
    pairs = {(r["id_a"], r["id_b"]) for r in ann_lsh_pairs(vecs, n_planes=3).collect()}

    e = vecs
    q = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    joined = e.join(q, F.col("vec_id") != F.col("qid"))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("cos").desc())
    top1 = (
        joined.select("qid", F.col("vec_id").alias("nid"), dot.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .collect()
    )
    true_pairs = {tuple(sorted((r["qid"], r["nid"]))) for r in top1}
    hit = sum(1 for p in true_pairs if p in pairs)
    recall = hit / len(true_pairs)
    assert recall > 0.15, recall
