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
graphs (near-clique clusters). For adversarial long-chain graphs the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log² n) rounds
regardless of diameter — :func:`connected_components` runs propagation
first and falls back to contraction at the round budget (``method="auto"``,
the default), so no graph shape ever aborts the dedup pipeline.

Scale notes: per-round lineage is truncated with ``localCheckpoint`` so
the plan does not grow with iterations; the convergence check is a
``count`` of changed labels (an aggregate — no driver-side data
collection). Non-convergence raises rather than returning silently-partial
clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _all_nodes(edges_nm: DataFrame, nodes: DataFrame | None) -> DataFrame:
    """Node universe = caller list (if any) ∪ every edge endpoint — an
    endpoint missing from a caller-supplied node list must still propagate
    (an inner label join would silently drop it and split its component)."""
    endpoints = edges_nm.select(F.col("n").alias("node"))
    if nodes is None:
        return endpoints.distinct()
    return (
        nodes.select(F.col(nodes.columns[0]).alias("node"))
        .union(endpoints)
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    method: str = "auto",
) -> DataFrame:
    """→ (node, cluster_id) with cluster_id = min node id in the component.

    ``nodes``: optional one-column frame of ALL node ids (isolated nodes
    cluster to themselves); defaults to the ids appearing in ``edges``.

    ``method``: ``"propagation"`` (min-label rounds, O(diameter), raises at
    ``max_iter``), ``"contraction"`` (large-star/small-star, O(log² n)
    rounds at ~2× the per-round shuffle cost), or ``"auto"`` (default):
    propagation first — the cheap path for the near-clique components dedup
    graphs actually produce — falling back to contraction if the round
    budget is exhausted, so adversarial diameters degrade to the robust
    algorithm instead of aborting.
    """
    if method not in ("auto", "propagation", "contraction"):
        raise ValueError(f"unknown connected-components method {method!r}")
    if method == "contraction":
        return connected_components_contraction(edges, src, dst, nodes)

    # materialize the edge list ONCE: every propagation round joins against
    # `und`, and the caller's edge plan is often an expensive pipeline (LSH
    # candidate generation) that must not be re-executed per round
    und = (
        edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
        .union(edges.select(F.col(dst).alias("n"), F.col(src).alias("m")))
        .localCheckpoint(eager=True)
    )

    # propagate over the ACTIVE subgraph only (round 7, guide §2.3): a node
    # with no edge never receives a neighbor min, so its label provably
    # never changes — isolated nodes rejoin as their own cluster after the
    # loop. In a dedup graph most documents are isolated, so the per-round
    # label shuffle/checkpoint carries only the edge-participating minority
    # (bench graph: 10.4k of 50k nodes; production dedup corpora are far
    # sparser) instead of the full node universe.
    active = und.select(F.col("n").alias("node")).distinct()
    labels = active.select("node", F.col("node").alias("lbl")).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und["m"] == labels["node"])
            .groupBy(F.col("n").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # the changed flag rides in the SAME job as the label update (one
        # checkpoint materializes both), so convergence costs only a
        # limit(1) probe over in-memory checkpointed blocks — not an extra
        # self-join + full count per round
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))).alias("lbl"),
                (F.coalesce("nbr_lbl", F.col("lbl")) < F.col("lbl")).alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where("chg").limit(1).count()
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            converged = True
            break
    if not converged:
        if method == "auto":
            return connected_components_contraction(edges, src, dst, nodes)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter too large for plain label propagation; "
            "use method='contraction' or 'auto')"
        )
    out = labels.select("node", F.col("lbl").alias("cluster_id"))
    if nodes is None:
        return out
    # caller-universe nodes outside the edge set cluster to themselves;
    # `labels` (checkpointed) is exactly the active node set, so the
    # anti-join probes in-memory blocks
    isolated = (
        nodes.select(F.col(nodes.columns[0]).alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
    )
    return out.union(isolated.select("node", F.col("node").alias("cluster_id")))


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: oriented (hi → lo), self-loops
    dropped, distinct."""
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_contraction(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    max_iter: int = 64,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al., SoCC'14
    §3, alternating formulation) — O(log² n) rounds independent of
    component diameter, the adversarial-graph-safe path.

    Per round: **large-star** hangs every strictly-larger neighbor of each
    node u onto m(u) = min(Γ(u) ∪ {u}); **small-star** (on hi→lo oriented
    edges) hangs each node's smaller neighbors and the node itself onto the
    minimum of that closed neighborhood. Both are one groupBy + one keyed
    join over the edge list — no step ever materializes a component in one
    task, so skewed mega-components stay distributed. Fixpoint: the edge
    set is a star forest, every non-minimum node pointing at its
    component's minimum; detected by a deterministic symmetric-difference
    check (two ``subtract`` probes on the canonical distinct edge set,
    ``limit(1)`` so the probe short-circuits). Lineage is truncated per
    round with ``localCheckpoint``, as in the propagation path.

    Output contract is identical to :func:`connected_components`:
    (node, cluster_id), cluster_id = min node id in the component.

    ``max_iter`` = 64 is a runaway backstop only — 2·log²(n) rounds at
    n = 10¹² is ~32; hitting 64 means the input violates the algorithm's
    assumptions (e.g. NaN ids) and raising beats looping forever.
    """
    E = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    E = E.localCheckpoint(eager=True)
    und_for_nodes = E.select(F.col("u").alias("n")).union(E.select(F.col("v").alias("n")))
    node_ids = _all_nodes(und_for_nodes, nodes)

    def _edge_sig(e: DataFrame):
        """Order-insensitive signature of a canonical edge set: one
        partial-aggregate scan over checkpointed blocks, NO shuffle — the
        cheap per-round convergence probe (count + xor + exact decimal sum
        of row hashes, the same commutative construction as the lineage
        manifests in ``io/checkpoint.py``)."""
        h = F.xxhash64("u", "v")
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(h).alias("x"),
            F.sum(h.cast("decimal(38,0)")).alias("s"),
        ).first()
        return (r["n"], (r["x"] or 0) & 0xFFFFFFFFFFFFFFFF, int(r["s"] or 0) % (1 << 64))

    sig = _edge_sig(E)
    for _ in range(max_iter):
        # large-star: for each u, m = min(Γ(u) ∪ {u}); emit (v, m) for
        # every neighbor v > u
        und = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = und.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", F.col("u")).alias("lsm")
        )
        large = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("lsm").alias("v"))
        )
        # persist (lazy) instead of an eager checkpoint: E1 derives from
        # the checkpointed E, so its lineage is one round deep — the E2
        # checkpoint below materializes it once and both E1 consumers reuse
        # the cached blocks. Saves one Spark job per round.
        E1 = _canon(large).persist()

        # small-star: edges already hi→lo; for each u, m = min of its
        # smaller neighbors; emit (v, m) for each smaller neighbor v and
        # (u, m) for u itself
        mins2 = E1.groupBy("u").agg(F.min("v").alias("ssm"))
        small = (
            E1.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("ssm").alias("v"))
            .union(mins2.select(F.col("u"), F.col("ssm").alias("v")))
        )
        E2 = _canon(small).localCheckpoint(eager=True)
        E1.unpersist()

        # convergence: compare this round's signature with the carried-
        # forward one (no rescan of E); only on a signature MATCH run the
        # exact symmetric-difference check — signatures collide essentially
        # never, so the shuffle-heavy subtract runs once, at the fixpoint.
        sig2 = _edge_sig(E2)
        if sig2 == sig and (
            E2.subtract(E).union(E.subtract(E2)).limit(1).count() == 0
        ):
            E = E2
            labels = E.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
            return (
                node_ids.join(labels, "node", "left")
                .select("node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id"))
            )
        E, sig = E2, sig2
    raise RuntimeError(
        f"connected_components_contraction did not converge in {max_iter} "
        "rounds — input ids are likely malformed (NaN/null)"
    )
