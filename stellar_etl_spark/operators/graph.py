"""Iterative graph algorithms as DataFrame programs.

The reference has no graph surface; this is beyond-reference capability for
entity-graph analytics over exported tables (account payment graphs in the
stellar domain; part–supplier graphs in the synthetic workload).  The point
demonstrated here is the *iterative join* execution shape: a bounded number
of Spark plan iterations, each one

    ranks ⋈ edges → groupBy(dst) partial-agg → new ranks

with the edge list persisted once and re-used, ranks re-derived per
iteration.

Scale shape: edges shuffle-partition by src once (the persist); each
iteration is one shuffle of the rank vector (|V| rows, small relative to
|E|).  AQE broadcast-joins the rank vector automatically when it fits —
at 100 TB-scale graphs both sides stay shuffle joins and the cost is
iterations × one |E|-sized hash join, the canonical Pregel-on-dataframes
layout.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from stellar_etl_spark.operators.util import lineage_cut


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    persist_edges: bool = False,
    broadcast_ranks: bool = False,
    symmetric: bool = False,
    ckpt_interval: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(src, dst)``.

    r_{k+1}(v) = (1-d) + d * Σ_{u→v} r_k(u) / outdeg(u), r_0 = 1.

    Dangling nodes (no out-edges) leak mass — the classic simplified
    formulation, chosen because it is exactly unrollable in ANSI SQL for
    the oracle.  Deterministic up to float-sum order; callers round.

    Execution shape knobs, all defaulting to the 100 TB-safe choice:

    - Default is a LAZY unrolled plan: the edge/degree subtree appears once
      per iteration but Catalyst's ReuseExchange collapses the repeated
      shuffles, and the whole run is ONE job at the caller's action —
      nothing executes at plan-build time.
    - ``ckpt_interval``: every k-th iteration the rank vector is cut out of
      the lineage with a lazy ``localCheckpoint(eager=False)``, bounding
      logical-plan depth at O(ckpt_interval) regardless of iteration count
      (round-2 verdict: unbounded unrolling re-derives the rank lineage per
      iteration).  Not every iteration: each checkpoint materializes as its
      own job at action time and forfeits cross-iteration exchange reuse,
      which measured *slower* than the unrolled plan below ~5 iterations
      at bench scale — so single-digit runs stay one fused job and long
      runs stay bounded-depth.
    - ``broadcast_ranks=True`` broadcast-joins the |V|-sized rank/contrib
      vectors instead of shuffling |E| per iteration — correct choice when
      the node set is dimension-sized (bounded catalog, not data-scaled);
      NOT valid for data-scaled node sets, hence opt-in.
    - ``symmetric=True`` declares the edge list symmetric (u→v implies
      v→u), so src-set = dst-set = node set: the separate node-set
      union/distinct and the per-iteration dangling-node left join are
      skipped (every node has in-edges, so ``contrib`` is already total).
      Purely an execution-shape shortcut — identical results when the
      declaration holds.
    - ``persist_edges=True`` caches the edge/degree subtree + eagerly
      materializes the result so the cache can be released before return:
      the right trade once the edge list out-costs its recompute (mandatory
      at 100 TB; at bench scale the recompute is cheaper).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(F.broadcast(deg) if broadcast_ranks else deg, "src")
    if symmetric:
        nodes = deg.select(F.col("src").alias("node"))
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    if persist_edges:
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            e.join(r, e["src"] == r["node"])
            .select(
                e["dst"].alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        if symmetric:
            # contrib covers every node (all nodes have in-edges)
            ranks = contrib.select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("mass")).alias(
                    "rank"
                ),
            )
        else:
            c = F.broadcast(contrib) if broadcast_ranks else contrib
            ranks = nodes.join(c, "node", "left").select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
        if (i + 1) % ckpt_interval == 0 and (i + 1) < iterations:
            # bound lineage depth for long runs; lazy — materializes with
            # the caller's action, blocks reclaimed by the ContextCleaner
            # (reliable checkpoint instead when a checkpoint dir is set)
            ranks = lineage_cut(ranks)
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


def triangle_stats(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Global triangle census of an undirected graph: one row with node,
    edge, wedge (open 2-path) and triangle counts plus the global
    clustering coefficient ``3·T / wedges``.

    Scale shape — degree-ordered orientation (Schank–Wagner / Cohen's
    MapReduce formulation): every edge is directed from its lower
    ``(degree, id)`` endpoint to the higher, which caps the out-degree at
    O(√E) regardless of hub skew, so the wedge self-join materializes
    Σ outdeg² candidates instead of Σ deg² — the difference between a
    bounded join and a hub-quadratic blowup on power-law graphs.  Each
    triangle has exactly one vertex with out-edges to the other two under
    a total order, so candidates close with ONE oriented equi-join and
    the count needs no /3 dedup.  Three shuffles total (degree agg, wedge
    join, closing join); the wedge count is the closed-form
    Σ d·(d−1)/2 — no join at all.
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6

    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("_a"),
            F.greatest(F.col(a), F.col(b)).alias("_b"),
        )
        .where(F.col("_a") != F.col("_b"))
        .distinct()
    )
    # e feeds the degree agg, the orientation join and the edge count:
    # eager cut once, result stays lazy (reliable checkpoint in cluster
    # mode — see lineage_cut)
    e = lineage_cut(e, eager=True, reliable=False)
    deg = (
        e.select(F.col("_a").alias("v"))
        .unionAll(e.select(F.col("_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("v").alias("_a"), F.col("d").alias("da")), "_a")
        .join(deg.select(F.col("v").alias("_b"), F.col("d").alias("db")), "_b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("_a") < F.col("_b"))
    )
    o = ed.select(
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("src"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("dst"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )
    # the oriented edge list feeds both wedge sides and the closing join
    o = lineage_cut(o, eager=True, reliable=False)
    # wedge at src: two out-neighbors ordered by the SAME (degree, id) total
    # order the orientation used, so the closing edge is oriented x -> y
    w1, w2 = o.alias("w1"), o.alias("w2")
    lt = (F.col("w1.dd") < F.col("w2.dd")) | (
        (F.col("w1.dd") == F.col("w2.dd")) & (F.col("w1.dst") < F.col("w2.dst"))
    )
    wedges = w1.join(
        w2, (F.col("w1.src") == F.col("w2.src")) & lt
    ).select(F.col("w1.dst").alias("x"), F.col("w2.dst").alias("y"))
    tri = wedges.join(
        o.select(F.col("src").alias("x"), F.col("dst").alias("y")), ["x", "y"]
    ).agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    summary = (
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        .crossJoin(tri)
    )
    out = summary.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        exact_ratio_round6(
            F.col("n_triangles") * 3, F.greatest(F.col("n_wedges"), F.lit(1))
        ).alias("global_clustering"),
    )
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iterations: int = 3,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    adopts the most frequent label among its neighbors each round, ties
    broken by the SMALLEST label — fully deterministic, so an unrolled SQL
    twin reproduces it exactly.  Distinct from min-label connected
    components (dedup_clusters): LPA's mode update splits dense regions
    into communities instead of flooding whole components.

    Shape per iteration: one labels⋈edges join + one (node, label) hash
    aggregate + one argmax-by-struct aggregate — all shuffles keyed on the
    node id.  The mode-argmax uses ``max(struct(cnt, -label))`` so the
    count-then-smallest-label order needs NO window.  Like pagerank's
    default, the plan stays LAZY and unrolled — Catalyst's ReuseExchange
    collapses the repeated edge-subtree shuffles, and bounded iteration
    counts keep lineage shallow (checkpoint per-k-rounds only pays off
    past ~5 iterations, measured on pagerank).  Isolated nodes keep their
    own id via the final left join."""
    labels = label_propagation_labels(
        edges, src, dst, iterations, broadcast_labels=broadcast_labels
    )
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_node"),
        F.max("node").cast("long").alias("max_node"),
    )


def label_propagation_labels(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iterations: int = 3,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Per-node (node, label) assignment from synchronous LPA — the label
    frame :func:`label_propagation` aggregates; exposed separately so
    partition-quality metrics (modularity) can reuse the identical
    deterministic rounds.

    ``broadcast_labels=True`` broadcast-joins the |V|-sized label frame
    into every round (and the argmax result into the isolated-node fill),
    making each round's big join map-side over the cached adjacency — the
    pagerank ``broadcast_ranks`` contract: correct ONLY when the node set
    is dimension-sized (a bounded catalog like the parts graph), never
    when it scales with the data; hence opt-in, default shuffle."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rev = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    # the symmetrized edge list appears in every iteration AND inside each
    # label frame's lineage — a lazy checkpoint caps the otherwise
    # multiplicative logical-plan growth (the labels chain still unrolls).
    # Repartition by the join key BEFORE the cut: the checkpointed frame
    # keeps its hash partitioning, so every round's edges⋈labels join
    # shuffles only the (|V|-sized) label side, never the edge list again —
    # the classic cached-adjacency layout for iterative graph ops.
    sym = lineage_cut(
        fwd.union(rev).distinct().repartition("v"), reliable=False
    )
    # |V| rows, referenced at init and in every round's isolated-node
    # fill-in — cut once instead of re-distincting the edge list per round
    nodes = lineage_cut(
        sym.select(F.col("u").alias("node")).distinct(), reliable=False
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    for _ in range(iterations):
        neigh = sym.join(
            bc(labels.withColumnRenamed("node", "v")), "v"
        ).select(F.col("u").alias("node"), "label")
        counted = neigh.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("_c")
        )
        picked = counted.groupBy("node").agg(
            F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m")
        ).select("node", (-F.col("_m._nl")).alias("label"))
        labels = nodes.join(bc(picked), "node", "left").select(
            "node", F.coalesce("label", F.col("node")).alias("label")
        )
    return labels


def modularity_summary(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Newman modularity of a node partition over an undirected simple
    graph, in EXACT integer arithmetic:

        Q = Σ_c [ e_c/m − (d_c / 2m)² ]  =  (4m·Σe_c − Σd_c²) / (4m²)

    with e_c = intra-community edge count, d_c = total degree of community
    c, m = |edges|.  Everything up to the single edge divide is integer
    (Σd_c² via the wide-decimal ratio helper, since d_c² sums can pass
    2^53 on power-law graphs).  One summary row — the partition-quality
    gate for any community detection run.

    Scale shape: one broadcast-or-shuffle join of edges against the label
    frame (twice, once per endpoint), two label-keyed aggregates, no
    windows.
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    la = labels.select(
        F.col("node").alias(src), F.col("label").alias("_la")
    )
    lb = labels.select(
        F.col("node").alias(dst), F.col("label").alias("_lb")
    )
    tagged = edges.select(src, dst).join(la, src).join(lb, dst)
    m_intra = tagged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("_la") == F.col("_lb"), 1).otherwise(0))
        .cast("long")
        .alias("sum_intra"),
    )
    deg = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dc = deg.join(labels, "node").groupBy("label").agg(
        F.sum("d").cast("long").alias("d_c")
    )
    dsq = dc.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sum_dsq"),
    )
    q_num = (
        F.lit(4).cast("long") * F.col("m") * F.col("sum_intra")
        - F.col("sum_dsq")
    )
    return (
        m_intra.crossJoin(dsq)
        .select(
            "m",
            "n_communities",
            "sum_intra",
            exact_ratio_round6_wide(
                q_num, F.lit(4).cast("long") * F.col("m") * F.col("m")
            ).alias("modularity"),
        )
    )


def k_core_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Bounded k-core peeling: each round drops nodes of degree < ``k``
    (over the surviving subgraph) and the edges touching them; output is
    one row per round with the surviving node/edge counts — the standard
    degeneracy screen for graph cleanup (spam rings, bot clusters, dense
    subgraph mining).

    The round count is FIXED, not run-to-fixpoint, so the oracle can
    unroll the identical peel: both engines compute the same bounded
    program, and the per-round curve itself shows whether the peel
    converged (equal consecutive rows).  Per round: one degree aggregate +
    two semi-join-shaped filters, all keyed by node id; lineage is cut per
    round with a lazy checkpoint so the unrolled plan stays additive.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    summaries = []
    for r in range(1, rounds + 1):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        keep = deg.where(F.col("_d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "u"), "u")
            .join(keep.withColumnRenamed("n", "v"), "v")
            .select("u", "v")
        )
        # per-round cut keeps the unrolled peel additive; reliable mode
        # (checkpoint dir set) survives executor loss on long peels
        e = lineage_cut(e, round_no=r - 1)
        nodes = e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        summaries.append(
            e.agg(
                F.lit(r).cast("int").alias("round"),
                F.count(F.lit(1)).cast("long").alias("edges_remaining"),
            ).crossJoin(
                nodes.agg(
                    F.count_distinct(F.col("n"))
                    .cast("long")
                    .alias("nodes_remaining")
                )
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.select("round", "nodes_remaining", "edges_remaining")


def harmonic_centrality_bounded(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    seed_mod: int = 100,
    max_depth: int = 3,
) -> DataFrame:
    """Harmonic centrality H(s) = Σ_{d(s,u) ≤ D} 1/d(s,u) for a HASH-CHOSEN
    seed set, via multi-source frontier BFS — the reachability-weighted
    importance measure that, unlike closeness, handles disconnected graphs.

    All-pairs BFS is |V|²-unsafe; seeding by ``node % seed_mod == 0`` keeps
    the frontier table (seed, node, dist) bounded by |seeds|·|reach| while
    preserving a deterministic, engine-independent sample.  Per round: one
    frontier⋈edges join + an anti-join against the visited set, both keyed
    by node id.  The harmonic sum uses integer 1/d weights at 1e6 scale
    (round(1e6/d) — exact integers, no float accumulation).
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = lineage_cut(sym)
    # tiny (|V|/seed_mod rows) but referenced in every BFS round's visited
    # union and the final assembly — cut once instead of re-distincting sym
    seeds = lineage_cut(
        sym.select(F.col("u").alias("s"))
        .distinct()
        .where(F.col("s") % seed_mod == 0),
        reliable=False,
    )
    visited = seeds.select("s", F.col("s").alias("node"))
    frontier = visited
    counts = []
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select("s", F.col("v").alias("node"))
            .distinct()
        )
        anti = nxt.join(visited, ["s", "node"], "left_anti")
        last = d == max_depth
        # the LAST round's frontier (the largest by far — reach grows
        # geometrically) feeds only its own count aggregate, never another
        # expansion: cutting it would materialize millions of (seed, node)
        # rows nothing reuses.  Earlier rounds stay cut — both the next
        # expansion and the visited anti-join replay them otherwise.
        new = anti if last else lineage_cut(anti, round_no=d - 1)
        counts.append(
            new.groupBy("s").agg(
                F.count(F.lit(1)).cast("long").alias(f"n_d{d}")
            )
        )
        if not last:
            # keep the consolidated visited set cut: the anti-join probes
            # it every round, and an n-leg cached union measured slower
            # (and less stable) than one re-materialized table here
            visited = lineage_cut(visited.unionByName(new), round_no=d - 1)
            frontier = new
    out = seeds
    for c in counts:
        out = out.join(c, "s", "left")
    filled = out.select(
        "s",
        *[
            F.coalesce(F.col(f"n_d{d}"), F.lit(0)).cast("long").alias(f"n_d{d}")
            for d in range(1, max_depth + 1)
        ],
    )
    weights = {d: round(1_000_000 / d) for d in range(1, max_depth + 1)}
    h_scaled = None
    for d in range(1, max_depth + 1):
        term = F.col(f"n_d{d}") * F.lit(weights[d])
        h_scaled = term if h_scaled is None else h_scaled + term
    return filled.select(
        F.col("s").alias("seed"),
        *[f"n_d{d}" for d in range(1, max_depth + 1)],
        h_scaled.cast("long").alias("harmonic_scaled"),
        exact_ratio_round6_wide(h_scaled, F.lit(1_000_000)).alias("harmonic"),
    )

def harmonic_centrality_bitset(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    seed_mod: int = 100,
    max_depth: int = 3,
    max_seeds: int | None = None,
) -> DataFrame:
    """:func:`harmonic_centrality_bounded` with the multi-source BFS state
    kept as per-NODE seed bitsets instead of (seed, node) pair rows.

    With S seeds the frontier/visited state is one row per node carrying
    ⌈S/64⌉ mask words; a BFS round is one edges⋈frontier join + one
    per-node ``bit_or`` aggregate + a word-wise ``new & ~visited`` — the
    (seed, node) DISTINCT and the pair anti-join (whose row count is
    |seeds|·|reach|, millions at depth 3) disappear.  Per-seed depth
    counts come from an Arrow-batched popcount histogram over the new-bit
    masks.  Reach sets — and therefore every output value — are identical
    to the pair form; the pair form's oracle still applies.

    Scale contract: valid while the SEED SET is bounded (mask width is
    S bits per node — S ≤ a few thousand keeps state per node tiny).
    When S scales with |V|, use the pair form: both shapes are
    O(S·reach) work, but the pair form never materializes per-node
    S-bit state.  One tiny driver-side action (seed count + index map,
    |seeds| rows) fixes the mask width at plan-build time — UNLESS the
    caller passes ``max_seeds``, an upper bound on the seed count: the
    mask width is then fixed from the bound and the plan builds fully
    lazily (no job until the result is consumed).  Unused high bits cost
    ⌈overshoot/64⌉ extra long columns of zeros and contribute nothing to
    the popcount histogram, so outputs are identical for any valid bound.
    A bound BELOW the true seed count raises at execution time (bit
    indices past the mask width), never silently truncates.
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    sym = lineage_cut(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .repartition("u"),
        reliable=False,
    )
    from pyspark.sql.window import Window

    seeds = lineage_cut(
        sym.select(F.col("u").alias("s"))
        .distinct()
        .where(F.col("s") % seed_mod == 0),
        reliable=False,
    )
    spark = edges.sparkSession
    if max_seeds is None:
        # ONE tiny driver-side aggregate (a count, no data collected) fixes
        # the mask width; the seed→bit index map stays distributed (a global
        # row_number over the |seeds|-row frame — bounded by contract)
        n_seeds = seeds.count()
        empty_schema = ", ".join(
            ["seed long"]
            + [f"n_d{d} long" for d in range(1, max_depth + 1)]
            + ["harmonic_scaled long", "harmonic double"]
        )
        if n_seeds == 0:
            return spark.createDataFrame([], empty_schema)
    else:
        # fully-lazy plan: the caller's bound fixes the width; zero seeds
        # degenerates to an empty seeds_idx → empty result, no early exit
        # needed
        if max_seeds < 1:
            raise ValueError("max_seeds must be >= 1")
        n_seeds = max_seeds
    words = (n_seeds + 63) // 64
    mcols = [f"m{w}" for w in range(words)]
    seeds_idx = lineage_cut(
        seeds.select(
            "s",
            (F.row_number().over(Window.orderBy("s")) - 1)
            .cast("long")
            .alias("si"),
        ),
        reliable=False,
    )

    mask_exprs = [
        F.expr(
            f"CASE WHEN si div 64 = {w} THEN "
            "shiftleft(cast(1 as bigint), cast(si % 64 as int)) "
            "ELSE cast(0 as bigint) END"
        ).alias(f"m{w}")
        for w in range(words)
    ]
    if max_seeds is not None:
        # an under-estimated bound must FAIL, not silently drop the seeds
        # whose bit index falls past the bound — guard against the exact
        # bound, not the word-aligned mask width: the popcount kernel
        # slices per_seed[:n_seeds], so indices in [max_seeds, words*64)
        # would otherwise truncate silently within the 64-bit slack
        guard = F.assert_true(
            F.col("si") < F.lit(n_seeds),
            F.lit(f"max_seeds={max_seeds} is below the actual seed count"),
        )
        mask_exprs[0] = F.when(guard.isNull(), mask_exprs[0]).alias("m0")
    state0 = seeds_idx.select(F.col("s").alias("node"), *mask_exprs)
    visited = lineage_cut(state0, reliable=False)
    frontier = visited

    def _popcount_counts(new_frame):
        # Arrow-batched per-seed histogram: stack the mask words as uint64,
        # unpack to a bit matrix, column-sum -> per-seed partial counts
        def kernel(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(
                    [pdf[c].values.astype(np.int64) for c in mcols], axis=1
                ).view(np.uint64)
                bits = np.unpackbits(
                    mat.view(np.uint8), axis=1, bitorder="little"
                )
                per_seed = bits.sum(axis=0, dtype=np.int64)[:n_seeds]
                nz = np.flatnonzero(per_seed)
                if len(nz) == 0:
                    continue
                yield pd.DataFrame(
                    {"si": nz.astype("int64"), "cnt": per_seed[nz]}
                )

        return (
            new_frame.select(*mcols)
            .mapInPandas(kernel, "si long, cnt long")
            .groupBy("si")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    counts = []
    for d in range(1, max_depth + 1):
        inc = frontier.join(sym, frontier.node == sym.u).select(
            F.col("v").alias("node"), *mcols
        )
        reach = inc.groupBy("node").agg(
            *[F.bit_or(c).alias(c) for c in mcols]
        )
        r, v_ = reach.alias("r"), visited.alias("v")
        new = (
            r.join(v_, F.col("r.node") == F.col("v.node"), "left")
            .select(
                F.col("r.node").alias("node"),
                *[
                    F.col(f"r.{c}")
                    .bitwiseAND(
                        F.bitwise_not(
                            F.coalesce(F.col(f"v.{c}"), F.lit(0).cast("long"))
                        )
                    )
                    .alias(c)
                    for c in mcols
                ],
            )
            .where(
                functools.reduce(
                    lambda a, b: a | b,
                    [F.col(c) != 0 for c in mcols],
                )
            )
        )
        last = d == max_depth
        new = new if last else lineage_cut(new, round_no=d - 1, reliable=False)
        counts.append(_popcount_counts(new).withColumnRenamed("cnt", f"n_d{d}"))
        if not last:
            nv, ov = new.alias("n"), visited.alias("o")
            visited = lineage_cut(
                ov.join(nv, F.col("o.node") == F.col("n.node"), "full").select(
                    F.coalesce(F.col("o.node"), F.col("n.node")).alias("node"),
                    *[
                        F.coalesce(F.col(f"o.{c}"), F.lit(0).cast("long"))
                        .bitwiseOR(
                            F.coalesce(F.col(f"n.{c}"), F.lit(0).cast("long"))
                        )
                        .alias(c)
                        for c in mcols
                    ],
                ),
                round_no=d - 1,
                reliable=False,
            )
            frontier = new

    out = seeds_idx
    for c in counts:
        out = out.join(F.broadcast(c), "si", "left")
    filled = out.select(
        "s",
        *[
            F.coalesce(F.col(f"n_d{d}"), F.lit(0)).cast("long").alias(f"n_d{d}")
            for d in range(1, max_depth + 1)
        ],
    )
    weights = {d: round(1_000_000 / d) for d in range(1, max_depth + 1)}
    h_scaled = None
    for d in range(1, max_depth + 1):
        term = F.col(f"n_d{d}") * F.lit(weights[d])
        h_scaled = term if h_scaled is None else h_scaled + term
    return filled.select(
        F.col("s").alias("seed"),
        *[f"n_d{d}" for d in range(1, max_depth + 1)],
        h_scaled.cast("long").alias("harmonic_scaled"),
        exact_ratio_round6_wide(h_scaled, F.lit(1_000_000)).alias("harmonic"),
    )
