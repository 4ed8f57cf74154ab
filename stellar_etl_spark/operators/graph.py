"""Iterative graph algorithms as DataFrame programs.

The reference has no graph surface; this is beyond-reference capability for
entity-graph analytics over exported tables (account payment graphs in the
stellar domain; part–supplier graphs in the synthetic workload).  The point
demonstrated here is the *iterative join* execution shape: a bounded number
of Spark plan iterations, each one

    ranks ⋈ edges → groupBy(dst) partial-agg → new ranks

with the edge list persisted once and re-used, ranks re-derived per
iteration (lineage stays a DAG of bounded depth — no checkpointing needed
for single-digit iteration counts).

Scale shape: edges shuffle-partition by src once (the persist); each
iteration is one shuffle of the rank vector (|V| rows, small relative to
|E|).  AQE broadcast-joins the rank vector automatically when it fits —
at 100 TB-scale graphs both sides stay shuffle joins and the cost is
iterations × one |E|-sized hash join, the canonical Pregel-on-dataframes
layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    persist_edges: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(src, dst)``.

    r_{k+1}(v) = (1-d) + d * Σ_{u→v} r_k(u) / outdeg(u), r_0 = 1.

    Dangling nodes (no out-edges) leak mass — the classic simplified
    formulation, chosen because it is exactly unrollable in ANSI SQL for
    the oracle.  Deterministic up to float-sum order; callers round.

    Default is a single LAZY unrolled plan: the edge/degree subtree appears
    once per iteration but Catalyst's ReuseExchange collapses the repeated
    shuffles, and the whole run is ONE job at the caller's action — nothing
    executes at plan-build time.  ``persist_edges=True`` switches to
    cache-the-edges + eager materialization (and immediate unpersist, so
    nothing leaks across invocations): the right trade once the edge list
    is expensive enough to out-cost its recompute — at 100 TB the persist
    is mandatory; at bench scale it doubles wall time.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(deg, "src")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist_edges:
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                e["dst"].alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
    if persist_edges:
        # Materialize the final iteration so the persisted edge list / node
        # set can be released here instead of leaking across invocations in
        # one session (CacheManager entries are not GC-cleaned;
        # localCheckpoint blocks are, via ContextCleaner once the result
        # goes out of scope).
        ranks = ranks.localCheckpoint(eager=True)
        e.unpersist()
        nodes.unpersist()
    return ranks
