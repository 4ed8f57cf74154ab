"""Similarity search over embedding columns (array<float>).

Beyond-reference surface: brute-force cosine top-k as the exactness baseline,
plus an IVF-style coarse-quantized variant as the 100 TB scale path.

All vector math is a left-to-right double fold (``aggregate`` over
``zip_with``) — deterministic accumulation order, so the DuckDB oracle's
``list_reduce`` reproduces it bit-for-bit before the final rounding guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stellar_etl_spark.operators.util import fixed_ln_micro, lineage_cut


def _check_i64_headroom(bound: int, where: str) -> None:
    """Fail loudly when a numpy int64 kernel would exceed 2^63 headroom.

    numpy int64 arithmetic WRAPS silently on overflow, whereas the Spark
    expression forms these kernels replaced raise under the project's
    ANSI-survivability contract (tests/test_ansi_mode.py).  ``bound`` must be
    an exact Python-int upper bound on the largest intermediate product; the
    check costs one max() scan per batch — negligible next to the matmul it
    protects.  Callers within the documented contract (quantization
    scale=1000, bounded dims) never trip it; out-of-contract inputs get an
    error instead of silently wrong results."""
    if bound >= 2**63:
        raise ArithmeticError(
            f"{where}: int64 overflow risk (product bound {bound} >= 2^63) — "
            "reduce the quantization scale or embedding magnitude/dims"
        )


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


# monotonically_increasing_id() = partition_id * 2^33 + row_index_within_
# partition, so (id mod 2^33) == 0 picks exactly the first row of every
# partition — no window, no shuffle, evaluated inline in the same stage.
_PARTITION_ROW_BITS = 1 << 33


def _attach_to_first_row(points: DataFrame, packed: DataFrame, col: str) -> DataFrame:
    """Attach a 1-row broadcast payload column to ONLY the first row of each
    partition feeding an Arrow kernel.

    The kernels below need a (tiny) codebook table once per task, but a
    broadcast join attaches it to EVERY row, and Arrow serializes the
    nested payload per row into the Python worker — for kmeans_fixed's
    k=8 x d=64 codebook that is ~4 KB/row, GBs per assign pass at the 10x
    probe (guide §4.1: pass only the columns the function needs; measured
    7.2 s -> 3.4 s for one pq_ann assign pass at 10x, identical output).
    Nulling the payload on all but the partition's first row keeps the
    plan fully lazy (no driver collect) and costs one when() per row;
    Arrow writes no bytes for null entries.  Kernels read the payload from
    row 0 of their first non-empty batch — batch order preserves partition
    order, so that row is guaranteed to carry it."""
    joined = points.crossJoin(F.broadcast(packed))
    first = F.expr(f"pmod(monotonically_increasing_id(), {_PARTITION_ROW_BITS}L) = 0")
    return joined.withColumn(col, F.when(first, F.col(col)))


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product: deterministic, engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: list[int] | None = None,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k for the given query ids.

    The query side is a pruned scan (few rows) and is broadcast; the corpus
    side streams — one broadcast-nested-loop over the corpus partitioning,
    no corpus shuffle.  Rank window partitions by query (bounded cardinality).
    """
    qids = query_ids or [0, 1, 2]
    # norms are precomputed once per row, not once per pair — the dot product
    # is then the only per-pair fold
    corpus = embeddings.select(
        F.col(id_col).alias("nbr_id"), _as_double(F.col(vec_col)).alias("nbr_vec")
    ).withColumn("nbr_norm", norm(F.col("nbr_vec")))
    queries = (
        embeddings.where(F.col(id_col).isin(qids))
        .select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        )
        .withColumn("q_norm", norm(F.col("q_vec")))
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                dot(F.col("q_vec"), F.col("nbr_vec"))
                / (F.col("q_norm") * F.col("nbr_norm")),
                round_digits,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine_sim")
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-label mean vector in long form (label, dim, centroid_val).

    posexplode + hash aggregate — partial-combine friendly; the long form
    avoids array reassembly (and is what the oracle compares)."""
    return (
        embeddings.select(
            F.col(label_col),
            F.posexplode(_as_double(F.col(vec_col))).alias("dim", "val"),
        )
        .groupBy(label_col, "dim")
        .agg(F.round(F.avg("val"), round_digits).alias("centroid_val"))
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_ids: list[int] | None = None,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus by its
    ``label`` partitions (stand-in for trained centroids), probe the
    ``nprobe`` nearest partitions per query, exact-rank within them.

    Scale path: the corpus is re-partitioned once by cell id; each query
    touches nprobe/ncells of the data instead of all of it.
    """
    qids = query_ids or [0, 1, 2]
    cent = label_centroids(embeddings, label_col, vec_col)
    cent_vec = cent.groupBy(label_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), F.col("centroid_val")))
        ).alias("pairs")
    ).select(
        F.col(label_col).alias("cell"),
        F.transform("pairs", lambda p: p["centroid_val"]).alias("cell_vec"),
    )
    queries = (
        embeddings.where(F.col(id_col).isin(qids))
        .select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        )
        .withColumn("q_norm", norm(F.col("q_vec")))
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("cell_sim"), F.asc("cell")
    )
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cent_vec))
        .select(
            "query_id",
            "q_vec",
            "q_norm",
            "cell",
            cosine(F.col("q_vec"), F.col("cell_vec")).alias("cell_sim"),
        )
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .where(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "cell")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("nbr_id"),
        F.col(label_col).alias("cell"),
        _as_double(F.col(vec_col)).alias("nbr_vec"),
    ).withColumn("nbr_norm", norm(F.col("nbr_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("nbr_id"))
    return (
        probes.join(corpus, "cell")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(
                dot(F.col("q_vec"), F.col("nbr_vec"))
                / (F.col("q_norm") * F.col("nbr_norm")),
                6,
            ).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "nbr_id", "cosine_sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.99,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by the coarse cell
    (label) — the standard scale recipe: candidates only form inside a
    cell, so the self-join shuffles each cell once instead of computing
    the corpus cross product.  At 100 TB the cell id comes from a coarse
    quantizer (see lsh_bucket_topk); the join shape is identical."""
    base = embeddings.select(
        F.col(label_col).alias("cell"),
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", norm(F.col("v")))  # once per row, not per pair
    a = base.select(
        F.col("cell"), F.col(id_col).alias("id_a"), F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = base.select(
        F.col("cell"), F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_digits,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= F.lit(threshold))
    )


def tfidf_cosine_pairs(
    df,
    id_col: str,
    text_col: str,
    max_df_ratio: float = 0.3,
    threshold: float = 0.3,
):
    """Sparse TF-IDF cosine similarity join over word tokens.

    The sparse-vector complement of ``embedding_near_dup_pairs``: documents
    meet only through shared *discriminative* tokens (document frequency ≤
    ``max_df_ratio``·N — stop-word pruning and, at scale, the join-fan-out
    guard: a token appearing in k docs contributes k² candidate pairs, so
    dropping corpus-wide tokens bounds the blow-up exactly where it would
    explode).  All weights are integer-scaled (tf × round(1000·ln(N/df)))
    so dot products aggregate EXACTLY (order-independent) in any engine;
    floats appear only in the final sqrt/divide, which are IEEE-deterministic.

    Shape: explode → two hash aggregates (tf, df) → token equi-join →
    pair aggregate.  No cross join; shuffles are keyed by token then pair.
    """
    from pyspark.sql import functions as F

    from stellar_etl_spark.operators.dedup import tokenize_words
    from stellar_etl_spark.operators.util import fan_out_small

    toks = fan_out_small(df).select(
        F.col(id_col), F.explode(tokenize_words(F.col(text_col))).alias("t")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    # N as a broadcast 1-row aggregate — keeps the whole query one lazy plan
    # (no eager driver-side count job at construction time).
    ndocs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        dfreq.crossJoin(F.broadcast(ndocs))
        .where(F.col("df") <= F.lit(max_df_ratio) * F.col("n_docs"))
        .select(
            "t",
            fixed_ln_micro("CAST(n_docs AS BIGINT)", "df", 1000)
            .alias("idf"),
        )
    )
    w = tf.join(kept, "t").select(
        F.col(id_col), F.col("t"), (F.col("tf") * F.col("idf")).alias("w")
    )
    w = w.persist()
    norm = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dot = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norm.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("na"))
    nb = norm.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6)
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def hybrid_rrf(
    lexical: DataFrame,
    semantic: DataFrame,
    id_col: str,
    lex_score: str,
    sem_score: str,
    k_rrf: int = 60,
    list_len: int = 50,
    limit: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic ranking — the
    standard hybrid-retrieval combiner (BM25 ∪ ANN → one list).

    Ranks are row_numbers over (score desc, id) — total orders, so the
    rank assignment is engine-independent.  The fused score is the
    INTEGER-RRF variant: Σ ⌊10⁹/(k + rank)⌋ over the lists the doc
    appears in — rank-monotone like 1/(k+rank) but exact integer
    arithmetic, so the fused ordering hash-matches the SQL oracle with no
    float-boundary risk.

    Scale shape: each side is already a top-``list_len`` candidate list
    (tiny); the fusion is a full-outer join of two ≤list_len-row frames —
    negligible next to the retrieval stages themselves.
    """
    wl = Window.orderBy(F.col(lex_score).desc(), F.col(id_col))
    ws = Window.orderBy(F.col(sem_score).desc(), F.col(id_col))
    lr = (
        lexical.select(F.col(id_col), F.col(lex_score))
        .withColumn("rank_lex", F.row_number().over(wl))
        .where(F.col("rank_lex") <= list_len)
        .select(id_col, "rank_lex")
    )
    sr = (
        semantic.select(F.col(id_col), F.col(sem_score))
        .withColumn("rank_sem", F.row_number().over(ws))
        .where(F.col("rank_sem") <= list_len)
        .select(id_col, "rank_sem")
    )
    scaled = F.lit(1_000_000_000).cast("long")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.floor(scaled / (F.lit(k_rrf) + F.col(r))).cast("long"), F.lit(0)
    )
    return (
        lr.join(sr, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.col("rank_lex"),
            F.col("rank_sem"),
            (contrib("rank_lex") + contrib("rank_sem")).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(limit)
    )


def semdedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    scale: int = 1000,
    tau_n: int = 7,
    tau_d: int = 20,
    block_cap: int = 512,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering + WITHIN-CLUSTER pairwise cosine — the all-pairs problem
    collapses to Σ|cluster|², bounded by choosing k ∝ corpus size.

    A document is dropped when a LOWER-id document in its cluster has
    cosine ≥ τ (τ = tau_n/tau_d) — the deterministic "dominated by an
    earlier neighbor" keep rule.  The threshold compare is EXACT integer
    arithmetic over the quantized vectors: cos ≥ τ ∧ dot ≥ 0 ⇔
    tau_d²·dot² ≥ tau_n²·‖a‖²·‖b‖² — no float comparisons, so the
    kept/dropped set hash-matches the SQL oracle bit-for-bit.

    Scale shape: the k-means stage is the bounded-iteration exact-integer
    plan of :func:`kmeans_fixed`; the dedup stage packs bounded blocks.
    The k knob SHOULD scale with corpus size (the paper's own contract),
    but a mis-sized k must degrade gracefully, not quadratically:
    ``block_cap`` hard-bounds the neighborhood — clusters larger than the
    cap split into deterministic id-ordered blocks of ≤block_cap members
    and domination is tested within a block.  Work per task is ≤cap²·d/2,
    blocks parallelize across the fleet, and a 10× over-full cluster costs
    10× (not 100×) at a bounded recall trade (measured: the uncapped shape
    ran 45× slower at 10× data; capped, ~linear).  When every cluster fits
    the cap the result is EXACTLY uncapped SemDeDup — which is how the
    oracle-checked scales behave.
    """
    # keep_vec=True: the clustering pass already carries the quantized
    # vector — re-deriving it via a corpus-sized self-join would add a
    # full extra shuffle (and a second scan) for data the plan already has
    assigned = kmeans_fixed(
        embeddings, id_col=id_col, vec_col=vec_col, k=k,
        iterations=iterations, scale=scale, keep_vec=True,
    )

    n2 = F.aggregate(
        F.col("_q"), F.lit(0).cast("long"), lambda a, x: a + x * x
    )
    # Pack each cluster ONCE and test "dominated by an earlier neighbor"
    # with a short-circuiting higher-order EXISTS over the member array —
    # the k-means subtree executes exactly once (a self-join would fork
    # the plan and re-run the clustering per side), and there is no pair
    # blow-up to shuffle: the only exchange is the groupBy(cid).  The
    # member array is the per-cluster working set — the k knob bounds it
    # (SemDeDup's own contract) so a cluster always fits a task.
    base = assigned.select(F.col("cid"), F.col(id_col), "_q", n2.alias("_n2"))
    # deterministic id-ordered blocks inside each cluster: rank-within-cid
    # is one shuffle+sort by cid (the same exchange the packing needs)
    blk = F.floor(
        (F.row_number().over(Window.partitionBy("cid").orderBy(id_col)) - 1)
        / block_cap
    ).alias("_blk")
    base = base.select("*", blk)
    packed = base.groupBy("cid", "_blk").agg(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("i"),
                F.col("_q").alias("q"),
                F.col("_n2").alias("n"),
            )
        ).alias("_ms")
    )
    # The domination test runs per BLOCK in an Arrow-batched numpy kernel:
    # one exact int64 Gram matrix (X·Xᵀ) per block, then the threshold
    # compare tau_d²·dot² ≥ tau_n²·‖a‖²·‖b‖² vectorized over the m×m pair
    # grid — the identical integer arithmetic the former nested-HOF EXISTS
    # evaluated per element on Spark's interpreted expression path (and the
    # pre-r6 explode-then-exists shape additionally copied the whole ~128 KB
    # member block into every member's row).  Work per task stays ≤cap²·d
    # integer ops; products stay inside int64 (dot ≤ d·(scale·|x|)² ≈ 6.4e7
    # ⇒ tau_d²·dot² ≤ 1.6e18 < 2^63, the documented headroom).
    tn2, td2 = tau_n * tau_n, tau_d * tau_d

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            cids, out_i, out_d = [], [], []
            for cid, members in zip(pdf["cid"], pdf["_ms"]):
                ids = np.array([m["i"] for m in members], dtype=np.int64)
                ns = np.array([m["n"] for m in members], dtype=np.int64)
                x = np.stack(
                    [np.asarray(m["q"], dtype=np.int64) for m in members]
                )
                # dot ≤ d·max|x|²; the threshold compare then squares it
                dot_max = x.shape[1] * int(np.abs(x).max(initial=0)) ** 2
                _check_i64_headroom(
                    max(int(tn2), int(td2)) * dot_max * dot_max,
                    "semantic_dedup gram kernel",
                )
                g = x @ x.T
                dom = (
                    (ids[:, None] < ids[None, :])
                    & (g >= 0)
                    & (td2 * g * g >= tn2 * ns[:, None] * ns[None, :])
                )
                dropped = dom.any(axis=0)
                cids.extend([cid] * len(ids))
                out_i.extend(ids.tolist())
                out_d.extend(dropped.tolist())
            yield pd.DataFrame(
                {id_col: out_i, "cid": cids, "dropped": out_d}
            )

    return packed.mapInPandas(
        kernel, f"{id_col} long, cid bigint, dropped boolean"
    )


def quantize_embeddings(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Symmetric int8 quantization per vector — the storage/transfer
    compression step for an embedding corpus (4× smaller than float32;
    dot products then run in integer domain).  Emits per-vector quality
    stats instead of the raw codes so results are scalar-comparable:
    scale, the int8 code range actually used, and the L2 reconstruction
    error.

    Determinism: `floor(x + 0.5)` instead of `round(double)` — floor is
    exact-value-based in every engine, while double `round` ties to the
    shortest decimal repr in Spark and the binary value elsewhere.  The
    error sum is a fixed left fold.  Narrow op: no shuffle, pure column
    expressions over the array.
    """
    from pyspark.sql import functions as F

    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # materialize scale/q as row columns first — a higher-order lambda that
    # references `amax` directly re-evaluates the array_max PER ELEMENT
    # (no CSE inside lambda bodies), turning an O(d) op into O(d²)
    base = df.where(amax > 0).select(
        F.col(id_col),
        v.alias("_v"),
        (amax / F.lit(127.0)).alias("_s"),
    )
    base = base.withColumn(
        "_q",
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x / F.col("_s") + F.lit(0.5)).cast("long"),
        ),
    )
    err2 = F.aggregate(
        F.zip_with(
            F.col("_q"),
            F.col("_v"),
            lambda qi, xi: (qi * F.col("_s") - xi) * (qi * F.col("_s") - xi),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return base.select(
        F.col(id_col),
        F.round(F.col("_s"), 6).alias("scale"),
        F.array_min(F.col("_q")).alias("q_min"),
        F.array_max(F.col("_q")).alias("q_max"),
        F.round(F.sqrt(err2), 6).alias("l2_err"),
    )


def kmeans_fixed(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    scale: int = 1000,
    keep_vec: bool = False,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over quantized embeddings — clustering
    for corpus curation (topic balancing, dedup-by-cluster sampling).

    Everything is **exact integer arithmetic**, so the result is
    deterministic and hash-comparable across engines:

    - vectors quantize once: ``q_i = round(v_i · scale)`` as longs;
    - squared L2 distances are integer sums (order-independent);
    - centroid updates are ``round(sum/count)`` of integers (both engines
      round half away from zero), re-quantized back to the integer grid;
    - ties in the argmin go to the lowest centroid id.

    Init: the ``k`` lowest-id vectors (deterministic, standard for
    reproducible pipelines).

    Scale shape per iteration: one broadcast of the k×d centroid table
    (tiny), one map-side assignment pass, one (k·d)-key partial-aggregated
    shuffle for the update — no driver-side collect; iterations bounded and
    unrolled into a single plan.

    The quantized point table is lineage-cut once (lazy localCheckpoint):
    it feeds the init cut, every assignment pass, and every update pass —
    without the cut the unrolled plan re-reads and re-quantizes the corpus
    O(iterations) times per action.  ``keep_vec=True`` carries the
    quantized vector through to the result so callers that need it
    (SemDeDup's within-cluster cosine) avoid a corpus-sized re-join.
    """
    q = F.transform(
        _as_double(F.col(vec_col)), lambda x: F.round(x * scale).cast("long")
    )
    pts = lineage_cut(
        embeddings.select(
            F.col(id_col).cast("long").alias(id_col), q.alias("_q")
        ),
        reliable=False,
    )

    w = Window.orderBy(id_col)
    cent = (
        pts.orderBy(id_col)
        .limit(k)
        .select((F.row_number().over(w) - 1).cast("long").alias("cid"), F.col("_q").alias("_c"))
    )

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        # Arrow-batched argmin kernel: stack each batch's quantized vectors
        # into an int64 matrix and evaluate all k squared-L2 distances with
        # numpy — bit-identical integer arithmetic to the former
        # zip_with/aggregate column form, which Spark executes on the
        # INTERPRETED expression path (higher-order functions are
        # CodegenFallback: per-element lambda dispatch + boxing; measured
        # ~2-3 s per assignment pass at 20k×64 vs ~0.1 s vectorized).  The
        # tiny k×d centroid table rides in as a broadcast-joined packed
        # column; argmin's first-minimum IS the lowest-cid tie-break
        # because the struct list is sorted by cid.
        packed = centroids.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cid"), F.col("_c")))
            ).alias("_cents")
        )
        # codebook rides on the FIRST row of each partition only — per-row
        # attachment serialized the whole k x d table through Arrow once per
        # point (see _attach_to_first_row)
        joined = _attach_to_first_row(points, packed, "_cents")
        schema = f"{id_col} long, _q array<bigint>, cid bigint, dist2 bigint"

        def kernel(batches):
            import numpy as np
            import pandas as pd

            cids = mat = None
            for pdf in batches:
                if pdf.empty:
                    continue
                if mat is None:
                    # first row of the first batch == the partition's first
                    # row, the only one carrying the codebook payload
                    cents = pdf["_cents"].iloc[0]
                    cids = np.array([c["cid"] for c in cents], dtype=np.int64)
                    mat = np.stack(
                        [np.asarray(c["_c"], dtype=np.int64) for c in cents]
                    )
                x = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["_q"]]
                )
                _check_i64_headroom(
                    x.shape[1]
                    * (
                        int(np.abs(x).max(initial=0))
                        + int(np.abs(mat).max(initial=0))
                    )
                    ** 2,
                    "kmeans assign kernel",
                )
                d2 = ((x[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
                best = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values,
                        "_q": pdf["_q"].values,
                        "cid": cids[best],
                        "dist2": d2[np.arange(len(best)), best],
                    }
                )

        return joined.mapInPandas(kernel, schema)

    assigned = assign(pts, cent)
    for _ in range(iterations - 1):
        upd = (
            assigned.select(
                "cid", F.posexplode(F.col("_q")).alias("dim", "val")
            )
            .groupBy("cid", "dim")
            .agg(
                F.round(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("cval")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("dim"), F.col("cval")))
                    ),
                    lambda s: s["cval"],
                ).alias("_c")
            )
        )
        assigned = assign(pts, upd)
    if keep_vec:
        return assigned.select(F.col(id_col), "cid", "dist2", "_q")
    return assigned.select(F.col(id_col), "cid", "dist2")


def pq_ann(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d: int = 64,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    scale: int = 1000,
    query_id: int = 0,
    top: int = 20,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011) — the codebook
    technique that makes billion-vector search tractable: each vector is
    ``m`` sub-vectors, each sub-space gets its own ``k``-centroid codebook
    (Lloyd, same exact-integer arithmetic as :func:`kmeans_fixed`), a
    vector compresses to ``m`` small codes, and a query scores the whole
    corpus from an m×k distance TABLE (asymmetric distance computation) —
    no full-vector math per candidate.

    Execution shape (all m sub-spaces in ONE plan — no per-subspace
    driver loop):

    - points explode to (id, sub, sub-vector): narrow, m× rows;
    - codebooks: per-(sub) Lloyd with k lowest-id init; each iteration is
      one broadcast of the m·k centroid table + one (m·k·dsub)-key
      partial-agg shuffle — identical scaling to kmeans_fixed;
    - encode: the final assignment IS the code (ties → lowest cid);
    - ADC: the query row's m sub-vectors join the m·k centroid table into
      an m×k distance table (broadcast), one equi-join on (sub, cid) + a
      per-id sum scores every vector — at 100 TB this is the scan-speed
    path, with the codebook + table always broadcast-sized.

    Exact integer arithmetic end-to-end (quantize → integer L2 →
    round(sum/count) updates), so the full top-``top`` result
    hash-matches the unrolled SQL oracle.  Returns
    (vec_id, adc_dist2, codes) ordered by (adc_dist2, vec_id).
    """
    dsub = d // m
    # slice the RAW vector first, quantize each dsub-slice: slicing a
    # transform() result re-evaluates the whole quantization once per
    # slice (lambda subtrees are not CSE'd across the m slice
    # expressions — measured 3.5 s vs 0.8 s at 20k×64); element-wise
    # values are identical either way
    sub_q = lambda j: F.transform(  # noqa: E731
        F.slice(F.col(vec_col), j * dsub + 1, dsub),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    subs = F.array(*[sub_q(j) for j in range(m)])
    # one lazy cut: the exploded sub-vector table feeds codebook init, every
    # Lloyd assignment pass, the query-row extraction AND the final encode —
    # uncut, the unrolled plan re-scans and re-explodes the corpus ~5x
    pts = lineage_cut(
        embeddings.select(
            F.col(id_col).cast("long").alias("vid"),
            F.posexplode(subs).alias("sub", "_q"),
        ),
        reliable=False,
    )

    # init = the k lowest-id vectors' subvectors.  TakeOrdered over the ids
    # (O(n), no full sort) then a broadcast semi-join — NOT a row_number
    # window over all (id, sub) rows, which would globally sort the
    # exploded corpus.
    init_ids = (
        embeddings.select(F.col(id_col).cast("long").alias("vid"))
        .orderBy("vid")
        .limit(k)
        .withColumn(
            "cid", F.row_number().over(Window.orderBy("vid")) - 1
        )
    )
    cents = pts.join(F.broadcast(init_ids), "vid").select(
        "sub", "cid", F.col("_q").alias("_c")
    )

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        # per-subspace Arrow-batched argmin (kmeans_fixed.assign's kernel
        # generalized to a multi-codebook table): the partition's first row
        # carries the full (sub, cid, _c) codebook, the kernel vectorizes
        # one sub-group at a time — exact int64 L2, argmin first-minimum ==
        # lowest-cid tie-break (struct sort orders by sub then cid)
        # the full m-sub codebook packs into ONE row (m*k rows of dsub
        # longs), attached to only the first row per partition — the former
        # per-sub equi-join shipped each row's 16x8 centroid list through
        # Arrow per point (see _attach_to_first_row; measured 7.2 s -> 3.4 s
        # per assign pass at the 10x probe, identical output)
        packed = centroids.agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("sub"), F.col("cid"), F.col("_c"))
                )
            ).alias("_book")
        )
        joined = _attach_to_first_row(points, packed, "_book")
        schema = "vid long, sub int, _q array<bigint>, cid bigint"

        def kernel(batches):
            import numpy as np
            import pandas as pd

            books = None
            for pdf in batches:
                if pdf.empty:
                    continue
                if books is None:
                    # partition row 0 (first row of the first batch) carries
                    # the whole codebook; group its (sub, cid, _c) structs
                    # (sorted by sub then cid) into per-sub argmin tables
                    by_sub: dict = {}
                    for c in pdf["_book"].iloc[0]:
                        by_sub.setdefault(c["sub"], []).append(c)
                    books = {
                        s: (
                            np.array([c["cid"] for c in cl], dtype=np.int64),
                            np.stack(
                                [
                                    np.asarray(c["_c"], dtype=np.int64)
                                    for c in cl
                                ]
                            ),
                        )
                        for s, cl in by_sub.items()
                    }
                subs = pdf["sub"].values
                x = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["_q"]]
                )
                out = np.empty(len(pdf), dtype=np.int64)
                for s in np.unique(subs):
                    m = subs == s
                    cids, mat = books[s]
                    _check_i64_headroom(
                        x.shape[1]
                        * (
                            int(np.abs(x[m]).max(initial=0))
                            + int(np.abs(mat).max(initial=0))
                        )
                        ** 2,
                        "pq_ann assign kernel",
                    )
                    d2 = ((x[m][:, None, :] - mat[None, :, :]) ** 2).sum(
                        axis=2
                    )
                    out[m] = cids[d2.argmin(axis=1)]
                yield pd.DataFrame(
                    {
                        "vid": pdf["vid"].values,
                        "sub": subs,
                        "_q": pdf["_q"].values,
                        "cid": out,
                    }
                )

        return joined.mapInPandas(kernel, schema)

    assigned = assign(pts, cents)
    final_cents = cents
    for _ in range(iterations - 1):
        upd = (
            assigned.select(
                "sub", "cid", F.posexplode(F.col("_q")).alias("dim", "val")
            )
            .groupBy("sub", "cid", "dim")
            .agg(
                F.round(F.sum("val").cast("double") / F.count(F.lit(1)))
                .cast("long")
                .alias("cval")
            )
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("dim"), F.col("cval")))
                    ),
                    lambda s: s["cval"],
                ).alias("_c")
            )
        )
        # m·k rows — but referenced twice (ADC table + final encode), and
        # each reference would otherwise replay the previous Lloyd round
        upd = lineage_cut(upd, reliable=False)
        final_cents = upd
        assigned = assign(pts, upd)

    # ADC distance table: query sub-vectors × final codebook
    qsubs = pts.where(F.col("vid") == query_id).select(
        "sub", F.col("_q").alias("_qq")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("_qq"), F.col("_c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    table = final_cents.join(F.broadcast(qsubs), "sub").select(
        "sub", "cid", l2.alias("td")
    )

    scored = (
        assigned.join(F.broadcast(table), ["sub", "cid"])
        .groupBy("vid")
        .agg(
            F.sum("td").alias("adc_dist2"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("sub"), F.col("cid")))
                    ),
                    lambda s: s["cid"].cast("string"),
                ),
                "-",
            ).alias("codes"),
        )
    )
    return (
        scored.select(F.col("vid").alias(id_col), "adc_dist2", "codes")
        .orderBy("adc_dist2", id_col)
        .limit(top)
    )


def pca_top_component(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 100,
    iterations: int = 3,
) -> DataFrame:
    """Top principal direction of an embedding corpus (un-centered — the
    dominant right-singular vector of the quantized data matrix) via POWER
    ITERATION expressed entirely as DataFrame programs: the curation-side
    "main axis" used for spectral filtering / outlier projection.

    Exactness contract (same scheme as :func:`kmeans_fixed`): vectors
    quantize once to the integer grid ``round(x·scale)``; the d×d Gram
    matrix is an exact integer aggregate; the iterated vector stays in
    DECIMAL(38,0) integer arithmetic (no normalization until the very end,
    so no float drift accumulates); only the final unit-normalization runs
    in double — one fixed-order fold + one correctly-rounded sqrt/divide,
    identical in both engines.

    Magnitude bound: |v_k| ≤ (d·G_max)^k with G_max = corpus·(scale·|x|)².
    With scale=100, d=64, 3 iterations the bound stays inside DECIMAL(38)
    up to ~10^9 rows; beyond that, rescale (divide the Gram by a power of
    ten — the eigenvector is scale-invariant) or lower ``scale``.

    Scale shape: the Gram matrix is computed as PER-ARROW-BATCH numpy
    ``Mᵀ·M`` partials (d² rows each) reduced by one (i,j)-keyed aggregate
    — one narrow mapInPandas pass over the corpus + a 4096-key shuffle.
    Iterations then run on the d²-row Gram frame and d-row vectors: tiny
    joins, no driver collect anywhere.
    """
    import pandas as pd

    q = F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.round(x * scale).cast("long"),
    )
    pts = embeddings.select(q.alias("_q")).where(F.size("_q") == dims)

    def gram_partials(batches):
        import numpy as np

        idx = np.arange(dims)
        ii = np.repeat(idx, dims)
        jj = np.tile(idx, dims)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
            _check_i64_headroom(
                len(pdf) * int(np.abs(M).max(initial=0)) ** 2,
                "pca gram kernel",
            )
            G = M.T @ M
            yield pd.DataFrame({"i": ii, "j": jj, "g": G.ravel()})

    gram = (
        pts.mapInPandas(gram_partials, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("g").cast("decimal(20,0)")).alias("g"))
    )

    spark = embeddings.sparkSession
    v = spark.range(dims).select(
        F.col("id").cast("int").alias("i"),
        F.lit(1).cast("decimal(38,0)").alias("val"),
    )
    for _ in range(iterations):
        v = (
            gram.join(
                v.select(F.col("i").alias("j"), F.col("val")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("val")).alias("val"))
        )

    packed = v.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("i", "val"))).alias("_a")
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("_a"),
            F.lit(0.0),
            lambda acc, x: acc
            + x["val"].cast("double") * x["val"].cast("double"),
        )
    )
    return (
        packed.select(norm.alias("_norm"), F.explode("_a").alias("_x"))
        .select(
            F.col("_x")["i"].alias("i"),
            F.round(
                F.col("_x")["val"].cast("double") / F.col("_norm"), 6
            ).alias("loading"),
        )
    )


def truncation_energy_audit(
    df: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    full_dim: int = 64,
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Matryoshka-style truncation audit: for each prefix length k, the
    share of a vector's squared norm captured by its first k dimensions,
    averaged per label — the standard diagnostic before serving truncated
    embeddings (MRL, Kusupati et al. 2022).

    Shape: one map-only projection (per-row left-fold energies over array
    slices — lambdas touch only their own arguments, per the HOF-inlining
    rule) followed by a single hash aggregate on (k, label).  Explode
    fan-out is |dims| (4), not the vector width.

    Determinism: per-row ratios are rounded ONCE into integer micro-units
    (round(e_k/e_full·10⁶) — both engines fold squares left-to-right from
    a zero init, so the doubles agree bit-for-bit), the group sum is exact
    integer, and the final mean is the exact-ratio helper.  Headroom: the
    2⁵³ bound needs n_vecs·10⁶ per (k,label) group under ~4×10⁹ — fine to
    ~4 billion vectors per label; shard the mean beyond that.
    """
    from pyspark.sql import functions as F

    from stellar_etl_spark.operators.util import exact_ratio_round6

    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))

    def energy(k: int):
        return F.aggregate(
            F.slice(v, 1, k), F.lit(0.0), lambda a, x: a + x * x
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.round(energy(k) / energy(full_dim) * 1_000_000)
                .cast("long")
                .alias("micro"),
            )
            for k in dims
        ]
    )
    ex = (
        df.where(energy(full_dim) > 0)
        .select(F.col(label_col), F.explode(pairs).alias("p"))
        .select(label_col, F.col("p.k").alias("k"), F.col("p.micro").alias("micro"))
    )
    agg = ex.groupBy("k", label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("micro").alias("_s"),
    )
    return agg.select(
        "k",
        label_col,
        "n_vecs",
        exact_ratio_round6(
            F.col("_s"), F.col("n_vecs") * F.lit(1_000_000)
        ).alias("avg_energy_ratio"),
    )


def hard_negative_mining(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_ids: list[int] | None = None,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor, the
    top-k most-similar vectors carrying a DIFFERENT label — the examples a
    contrastive loss learns the most from (and the standard retrieval-
    training data-prep step).

    Same execution shape as :func:`cosine_topk`: the bounded anchor set
    broadcasts, the corpus streams (no corpus shuffle), norms precompute
    per row, and the rank window partitions by anchor.  The label
    inequality is just one more pushed predicate on the pair stream.
    """
    aids = anchor_ids or list(range(20))
    corpus = embeddings.select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        _as_double(F.col(vec_col)).alias("n_vec"),
    ).withColumn("n_norm", norm(F.col("n_vec")))
    anchors = (
        embeddings.where(F.col(id_col).isin(aids))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            _as_double(F.col(vec_col)).alias("a_vec"),
        )
        .withColumn("a_norm", norm(F.col("a_vec")))
    )
    scored = (
        F.broadcast(anchors)
        .crossJoin(corpus)
        .where(F.col("anchor_label") != F.col("neg_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round(
                dot(F.col("a_vec"), F.col("n_vec"))
                / (F.col("a_norm") * F.col("n_norm")),
                round_digits,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine_sim"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("rank").cast("long").alias("rank"),
            "neg_id",
            "neg_label",
            "cosine_sim",
        )
    )
