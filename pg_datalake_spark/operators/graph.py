"""Iterative graph analytics on DataFrames (PageRank).

Complements the label-propagation connected components in
``operators/dedup.py:dup_clusters`` (the other driver-looped iterative
operator) with weighted numeric iteration: PageRank over an edge
DataFrame. The reference engine has no graph operators; this is part
of the beyond-reference tier for corpus curation (rank documents in a
link/citation graph to weight a training mix, find hub/authority
boilerplate, etc.).

Scale shape per iteration: one shuffle join of edges against the
current ranks (|edges| rows), one partial-aggregable sum per
destination node, one broadcast of the 1-ROW dangling-mass aggregate.
The driver never holds node or edge data — the only driver-side value
is |nodes| (one count, the standard PageRank constant). Iterations
are driver-sequenced like ``dup_clusters``; each round persists the
new ranks and unpersists the old.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list: ``iterations`` rounds of

        rank' = (1-d)/N + d * (Σ_in rank(src)/outdeg(src) + dangling/N)

    with dangling mass (rank parked on nodes with no out-edges)
    redistributed uniformly — the textbook formulation, so a fixed
    iteration count is reproducible across engines (the oracle unrolls
    the same rounds as CTEs).

    ``nodes`` defaults to the distinct edge endpoints; pass it
    explicitly when isolated nodes must participate. Returns
    ``(node, rank)``.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .unionByName(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    nodes = nodes.select("node").persist()
    n = nodes.count()  # one driver-side scalar: the PageRank constant N
    base = (1.0 - damping) / n
    outdeg = edges.groupBy(src).agg(F.count("*").alias("__outdeg"))
    ed = edges.select(src, dst).join(outdeg, src).persist()
    out_nodes = outdeg.select(F.col(src).alias("node"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed[src] == ranks["node"])
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        # dangling mass as a 1-row aggregate, broadcast — never collected
        dang = (
            ranks.join(out_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .persist()
        )
        # materialize before dropping the old cache: new_ranks reads
        # `ranks` twice (contrib + dangling), so an unmaterialized
        # chain would double the plan every round — the count pins the
        # round to an InMemoryRelation and keeps planning linear
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    ed.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    # hand back a lineage-truncated copy and drop our cache entry:
    # localCheckpoint blocks are owned by the returned frame (the
    # ContextCleaner frees them when the caller drops it), whereas a
    # persisted frame would sit in the session's cache manager forever
    result = ranks.localCheckpoint(eager=True)
    ranks.unpersist(blocking=False)
    return result
