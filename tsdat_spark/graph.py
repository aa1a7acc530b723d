"""Connected components over an edge list — the clustering step of
near-duplicate dedup (LSH candidate pairs → duplicate clusters → one keeper
per cluster; the step after ``text/dedup.py``'s pair generation that a
production training-data pipeline runs before dropping duplicates).

Algorithm: minimum-label propagation. Every node starts labeled with its
own id; each round a node takes the min label among itself and its
neighbors; fixpoint = each component labeled by its smallest member.
Rounds are pure DataFrame joins/aggregations (two shuffles each), so the
work is fully distributed; the driver only checks the converged-yet
aggregate. Converges in O(component diameter) rounds — small for dedup
graphs (near-clique clusters); for adversarial long-chain graphs the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) halves diameter per round and would
swap in here, same interface.

Scale notes: per-round lineage is truncated with ``localCheckpoint`` so
the plan does not grow with iterations; the convergence check is a
``count`` of changed labels (an aggregate — no driver-side data
collection). Non-convergence raises rather than returning silently-partial
clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """→ (node, cluster_id) with cluster_id = min node id in the component.

    ``nodes``: optional one-column frame of ALL node ids (isolated nodes
    cluster to themselves); defaults to the ids appearing in ``edges``.
    """
    und = edges.select(F.col(src).alias("n"), F.col(dst).alias("m")).union(
        edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    )
    if nodes is None:
        node_ids = und.select(F.col("n").alias("node")).distinct()
    else:
        # union edge endpoints in: an endpoint missing from a caller-supplied
        # node list must still propagate (an inner label join would silently
        # drop it and split its component)
        node_ids = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .union(und.select(F.col("n").alias("node")))
            .distinct()
        )

    labels = node_ids.select("node", F.col("node").alias("lbl")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["m"] == labels["node"])
            .groupBy(F.col("n").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("lbl", "old"), "node")
            .where(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter too large for plain label propagation; "
        "use large-star/small-star contraction)"
    )
