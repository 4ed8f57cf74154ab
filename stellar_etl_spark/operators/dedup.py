"""Deduplication operators for large-scale document corpora.

Beyond-reference surface (BASELINE.json north star): exact dedup, MinHash+LSH
near-dup, SimHash, and n-gram Jaccard verification — all as shuffle-conscious
DataFrame programs:

  - every hash primitive is ``md5`` / hex-fold — JVM built-ins, codegen'd,
    and reproducible in ANSI SQL (the DuckDB oracle runs the same recipe);
  - LSH banding turns the quadratic all-pairs problem into an equi-join on
    (band_id, band_key): at 100 TB that is one shuffle keyed by band hash,
    with AQE skew-splitting hot buckets; no driver-side state anywhere.

Sizing the verify stage before running it (the 10× probe lesson): the
candidate/output volume of every near-dup operator is bounded below by the
TRUE answer size, and for a corpus whose duplicate groups have sizes c_1,
c_2, … the pair count is Σ c_i·(c_i−1)/2 — quadratic in GROUP size, not
corpus size.  A corpus of n docs with duplication rate d spread over
many small groups yields ≈ n·d pairs; the same rate concentrated in few
giant groups yields ≈ (n·d)² / (2·#groups).  Estimate Σ c_i² cheaply
first (one exact-dedup hash aggregate → ``sum(dup_count²)``) and budget
the verify join for that output — a plan that is linear in candidates
cannot be sublinear in the answer it must emit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stellar_etl_spark.operators.util import lineage_cut

# Threshold bounds below are computed in float (e.g. ceil(t·|S|)); products
# like 0.6*5 evaluate to 3.0000000000000004, so a plain ceil/comparison
# overshoots and prunes a pair whose similarity is EXACTLY the threshold even
# though the verify stage would emit it.  Every candidate-side bound therefore
# subtracts this sub-integer epsilon first: candidates can only widen (the
# exact verify re-checks), keeping generation provably complete.
_BOUND_EPS = 1e-9


def _ceil_bound(x: Column) -> Column:
    """Conservative ``ceil`` for candidate-filter thresholds (see _BOUND_EPS)."""
    return F.ceil(x - F.lit(_BOUND_EPS))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: keep the lowest id per md5(text).

    One hash-aggregate shuffle on the digest (map-side combinable);
    survivors join back by id, broadcast-friendly when the survivor set
    is small relative to the corpus.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def tokenize_words(text: Column) -> Column:
    """Whitespace tokenization — single-space split, matching the oracle's
    ``string_split(text, ' ')``."""
    return F.split(text, " ")


def word_ngrams(words: Column, n: int) -> Column:
    """Positional word n-grams via SELF-CONTAINED lambdas: ``n`` aligned
    slices of ``words`` folded pairwise with ``zip_with(concat_ws)``.

    The obvious spelling — ``transform(sequence(1, len-n+1),
    i -> array_join(slice(words, i, n)))`` — captures the outer ``words``
    expression inside the lambda, and Spark INLINES captured expressions per
    element rather than CSE-ing them, so an unprojected ``split(text)``
    re-tokenizes the whole document for every gram: O(len²) per row (the
    char_entropy lesson).  Here every lambda touches only its own arguments;
    the slices sit outside and cost O(n·len) per row total.  Empty result
    for < n words (slice length max(len-n+1, 0))."""
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    acc = F.slice(words, 1, m)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(words, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return acc


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (empty array if < n words)."""
    return F.array_distinct(word_ngrams(tokenize_words(text), n))


MINHASH_PRIME = 2147483647  # 2^31-1: (2p+1)*h + b stays far below int64


def minhash_from_hashes(hash_col: Column, num_perm: int = 8) -> Column:
    """Affine permutation family ``(a_p·h + b_p) mod P`` over precomputed
    31-bit base hashes; min per permutation = the signature element."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hash_col,
                    lambda h: ((2 * p + 1) * h + 98765 * p + 12345)
                    % MINHASH_PRIME,
                )
            )
            for p in range(num_perm)
        ]
    )


def minhash_signature(shingle_col: Column, num_perm: int = 8) -> Column:
    """MinHash signature: ONE md5 per shingle → 31-bit base hash, then the
    classic affine permutation family per element — 8× fewer digest
    computations than an md5-per-permutation recipe, all integer arithmetic
    inside codegen.  Equality probability per element ≈ Jaccard similarity
    (minwise family)."""
    base = F.transform(
        shingle_col, lambda s: _hex15_to_long(F.md5(s)) % MINHASH_PRIME
    )
    return minhash_from_hashes(base, num_perm)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash_sig",
    bands: int = 4,
    rows_per_band: int = 2,
    size_col: str | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band bucket.

    Scale shape: explode to (bands × docs) rows, equi-join on band key.
    The join is the only shuffle; band keys are md5 digests so the key space
    is uniform unless documents genuinely collide.

    When the caller will verify Jaccard ≥ ``threshold``, pass the
    shingle-set size column as ``size_col``: Jaccard ≥ t forces
    ``|A| ≤ |B|/t`` both ways, so size-incompatible band collisions are
    pruned inside the join, before the pair-distinct and the exact verify
    (measured 590k → fewer candidate rows at the 10× probe).  Callers that
    study the raw collision stream (the calibration curve) leave it unset.
    """
    extra = [F.col(size_col)] if size_col else []
    banded = df.select(
        F.col(id_col),
        *extra,
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(b),
                            *[
                                F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cond = (
        (F.col("l.band_id") == F.col("r.band_id"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    )
    if size_col and threshold:
        # max·t ≤ min, phrased as two one-sided bounds with the lenient
        # epsilon on the comparison side (see _BOUND_EPS)
        cond = (
            cond
            & (
                F.col(f"l.{size_col}") * F.lit(threshold)
                <= F.col(f"r.{size_col}") + F.lit(_BOUND_EPS)
            )
            & (
                F.col(f"r.{size_col}") * F.lit(threshold)
                <= F.col(f"l.{size_col}") + F.lit(_BOUND_EPS)
            )
        )
    return (
        left.join(right, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact n-gram Jaccard verification.

    Returns (id_a, id_b, jaccard) for pairs with Jaccard ≥ threshold.
    Jaccard is exact set overlap of distinct shingles — an integer ratio, so
    bit-identical across engines.
    """

    from stellar_etl_spark.operators.util import fan_out_small

    df = fan_out_small(df)

    # base hashes as their own projection: the 8 permutation transforms then
    # reference a column instead of inlining the md5 subtree 8× (smaller
    # codegen, one digest pass)
    with_sh = (
        df.select(F.col(id_col), shingles(F.col(text_col), n).alias("shingle_set"))
        .withColumn(
            "_base_hashes",
            F.transform(
                F.col("shingle_set"),
                lambda s: _hex15_to_long(F.md5(s)) % MINHASH_PRIME,
            ),
        )
        .withColumn(
            "minhash_sig", minhash_from_hashes(F.col("_base_hashes"), num_perm)
        )
        .withColumn("_n_sh", F.size("shingle_set"))
        .drop("_base_hashes")
    )
    # The signature subtree feeds 4 branches (both sides of the LSH self-join
    # and both sides of the verify join); cut it eagerly so shingling+md5
    # runs once and the RESULT stays lazy (streams straight to the caller's
    # sink — an eager cut of the result instead cost a full extra pass,
    # measured +20% on the bench).  lineage_cut: localCheckpoint here,
    # reliable checkpoint when the session has a checkpoint dir.
    with_sh = lineage_cut(with_sh, eager=True, reliable=False)
    # empty/NULL shingle sets (docs under n words, NULL text) carry no
    # signal and would all collide on the all-NULL signature band — then
    # 0/0 in the verify.  The oracle filters them too.  The filter sits
    # ABOVE the lineage cut on purpose (round-9): below it, Catalyst
    # pushes the predicate through the projection into the scan stage,
    # re-deriving the whole shingle HOF chain per row at raw-scan
    # parallelism BEFORE the fan-out repartition — measured 3.5 s of a
    # 2-task straggler stage at the 10× probe vs 0.6 s for the same
    # shingling done once, 32-way, above the exchange.  Post-cut the
    # predicate reads the materialized array column: O(1) per row.
    with_sh = with_sh.where(F.col("_n_sh") > 0)

    cands = minhash_lsh_candidates(
        with_sh, id_col, "minhash_sig", bands, rows_per_band,
        size_col="_n_sh", threshold=threshold,
    )
    a = with_sh.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("sh_a"))
    b = with_sh.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("sh_b"))
    pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", _jaccard_expr().alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return pairs


def _jaccard_expr() -> Column:
    """Exact Jaccard of two DISTINCT shingle arrays ``sh_a``/``sh_b``:
    ``|∩| / (|A| + |B| − |∩|)``.  One hash-set pass (array_intersect)
    instead of two — ``array_union`` would rebuild the same set to count
    ``|∪| = |A| + |B| − |∩|``, an identity that holds exactly because
    shingle sets are duplicate-free (array_distinct upstream), so the
    integer denominator and hence the double ratio are bit-identical to
    the two-pass form (round-9, guide §1.2 per-task work)."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")


def _hex15_to_long(hex_col: Column) -> Column:
    """First 15 hex chars of a digest → 60-bit long (overflow-free under
    ANSI mode, reproducible as a hex fold in the oracle)."""
    return F.conv(F.substring(hex_col, 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash over word tokens with term-frequency votes.

    Each token occurrence votes ±1 per bit of its 60-bit md5-derived hash;
    the fingerprint keeps the top ``bits`` bit positions.

    Map-only: token hashes materialize once per row (one md5 per
    occurrence), then each bit's tally is an integer filter-count over that
    array — ZERO shuffles, vs the explode-to-(doc, bit) shape that pushes
    16× token-grain rows through two hash aggregates.  Per-bit tally
    ``2·|set| − n`` equals the sum of ±1 votes.
    """
    from stellar_etl_spark.operators.util import fan_out_small

    # NULL text has no fingerprint — the row drops (matching the oracle,
    # where unnest(split(NULL)) yields no rows for the doc)
    base = fan_out_small(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.transform(
            tokenize_words(F.col(text_col)), lambda w: _hex15_to_long(F.md5(w))
        ).alias("_hs"),
    )
    hs = F.col("_hs")

    def _bit_set(mask: int):
        # closure factory — a default-arg lambda would change the arity and
        # make pyspark treat it as an (element, index) lambda
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    fingerprint = F.lit(0).cast("long")
    for b in range(bits):  # unrolled: constant masks, no per-row bit loop
        mask = 1 << b
        set_count = F.size(F.filter(hs, _bit_set(mask)))
        fingerprint = fingerprint + F.when(
            set_count * 2 > F.size(hs), F.lit(mask).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return base.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_distance: int = 2,
    bucket_cap: int = 1024,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_distance``.

    LSH by pigeonhole: split the fingerprint into ``max_distance + 1``
    disjoint bit bands — any pair within distance d differs in at most d
    bands, so it must agree EXACTLY on at least one band.  Joining on
    (band index, band value) is therefore candidate-complete; survivors get
    an exact popcount check.  Same shape as MinHash banding: explode →
    equi-join → verify, no cross join anywhere.  At corpus scale raise
    ``bits`` (e.g. 64) so band values stay selective; band count tracks the
    distance budget, not the corpus.

    A mis-sized ``bits`` must degrade gracefully, not quadratically:
    band buckets larger than ``bucket_cap`` split into deterministic
    id-ordered blocks and candidates form within a block (the 10× probe
    measured the unguarded shape at 32× wall for 10× data — a 5-bit band
    over a 500 k corpus put ~15 k docs in every bucket).  Buckets under
    the cap — every oracle-checked scale — pair exactly as before.

    The Hamming verify is FUSED into the candidate join (round-9): the
    banded rows carry the 8-byte fingerprint, ``bit_count(l ⊕ r) ≤ d``
    is one more codegen'd conjunct on the join, and only survivors reach
    the pair-distinct.  The former shape materialized EVERY raw band
    collision (≈ n·cap/2 rows) through a distinct aggregate and two id
    joins back to the fingerprint table before filtering; fusing removes
    both verify joins and shrinks the distinct to the answer size
    (measured 3.2 s → 1.7 s at sf0.1, byte-identical 981 k pairs).
    """
    fp = lineage_cut(
        simhash(df, id_col, text_col, bits), eager=True, reliable=False
    )
    n_bands = max_distance + 1
    width = bits // n_bands
    bands = []
    start = 0
    for i in range(n_bands):
        w = width + (1 if i < bits % n_bands else 0)
        bands.append(
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"shiftright(simhash, {start})")
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
        )
        start += w
    banded = (
        fp.select(
            F.col(id_col),
            F.col("simhash"),
            F.explode(F.array(*bands)).alias("b"),
        )
        .select(id_col, "simhash", "b.band", "b.val")
        .withColumn(
            "blk",
            F.floor(
                (
                    F.row_number().over(
                        Window.partitionBy("band", "val").orderBy(id_col)
                    )
                    - 1
                )
                / bucket_cap
            ),
        )
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (
                F.bit_count(
                    F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
                )
                <= F.lit(max_distance)
            ),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
    )
    return pairs


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_iterations: int = 15,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    near-dup pair graph, labeled by the component's minimum doc id — the
    grouping a dedup pipeline actually keeps one survivor per.

    Iterative min-label propagation (the standard distributed CC algorithm):
    each round joins labels across edges and keeps the per-node minimum;
    terminates at fixpoint (component diameter rounds, typically 2-3 for
    near-dup clusters).  Each round is one shuffle join + one aggregate —
    no driver-side graph state, scales with the edge list.

    The label frame is lazily ``localCheckpoint``-ed per round, so the
    convergence ``.count()`` both materializes it and truncates its lineage:
    round k's plan reads round k-1's checkpointed blocks instead of
    re-deriving the whole propagation tree (round-2 verdict fix).
    """
    edges = near_dup_pairs(
        df, id_col, text_col, n, num_perm, bands, rows_per_band, threshold
    ).select("id_a", "id_b")
    adj = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    adj = adj.persist()

    labels = (
        adj.select(F.col("src").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    labels = lineage_cut(labels)
    for _round in range(max_iterations):
        nbr = adj.join(labels, adj.dst == labels.node).select(
            F.col("src").alias("node"), F.col("label")
        )
        new_labels = (
            labels.select("node", "label")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = lineage_cut(new_labels, round_no=_round)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # Final labels are checkpointed (materialized by the last count), so
    # the returned frame no longer references the cached adjacency list.
    adj.unpersist()
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup via prefix filtering (PPJoin-lite).

    The LSH-free, loss-free member of the dedup family.  Candidate rule:
    order each doc's shingles rarest-first (global frequency, then shingle —
    a deterministic total order) and keep the first
    ``|S| - ceil(t·|S|) + 1`` as its *prefix*; any pair with
    Jaccard ≥ t MUST share a prefix shingle (pigeonhole on the overlap
    bound), so joining on prefix shingles is candidate-complete — unlike
    LSH there are no false negatives.  A size-compatibility bound
    (``|A| ≤ |B|/t``) prunes survivors before exact verification.

    Scale shape: everything is explode → count → equi-join — no cross or
    range join.  The frequency pass is one extra linear aggregation; the
    prefix join shuffles only prefix rows (≈ half the shingle volume), keyed
    by shingle so rare shingles (the common case in a large corpus) collide
    almost never.  Exact verification touches only surviving pairs.

    Returns (id_a, id_b, jaccard), jaccard an exact integer ratio —
    bit-identical across engines.
    """
    from pyspark.sql.window import Window

    from stellar_etl_spark.operators.util import fan_out_small

    sh = fan_out_small(df).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("shingle_set")
    )
    # shingle sets feed the frequency pass, the prefix pass and both verify
    # sides: one eager cut, lazy result (see near_dup_pairs).  The
    # empty-set filter applies ABOVE the cut so it cannot push into the
    # scan stage and re-derive the shingle chain pre-fan-out (see
    # near_dup_pairs for the measured cost of that shape).
    sh = lineage_cut(sh, eager=True, reliable=False).where(
        F.size("shingle_set") > 0
    )

    ex = sh.select(
        F.col(id_col),
        F.size("shingle_set").alias("_n"),
        F.explode("shingle_set").alias("_s"),
    )
    freq = ex.groupBy("_s").agg(F.count(F.lit(1)).alias("_c"))
    # prefix length |S| - ceil(t|S|) + 1; t=0.5 → n//2 + 1 in pure integers
    prefix_len = (
        F.col("_n")
        - _ceil_bound(F.lit(threshold) * F.col("_n")).cast("long")
        + F.lit(1)
    )
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy("_c", "_s")
    )
    prefix = (
        ex.join(freq, "_s")
        .withColumn("_rn", rn)
        .where(F.col("_rn") <= prefix_len)
        .select(F.col(id_col), F.col("_s"), F.col("_n"), F.col("_rn"))
    )
    l, r = prefix.alias("l"), prefix.alias("r")
    # PPJoin positional filter (Xiao et al. 2008, §3.2): a match on a
    # shared prefix shingle at ranks (i, j) can contribute an overlap of
    # at most 1 + min(|A|−i, |B|−j) (every other shared shingle sorts
    # AFTER it in the same global rarest-first order on both sides), and
    # Jaccard ≥ t needs overlap ≥ ceil(t/(1+t)·(|A|+|B|)).  Rows failing
    # the bound are pruned BEFORE the pair-distinct; exactness holds
    # because the FIRST shared prefix shingle of any truly-similar pair
    # always passes (its bound upper-bounds the true overlap).  Measured
    # at sf0.1/t=0.5: 310k → far fewer candidate rows into the verify.
    alpha = _ceil_bound(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("l._n") + F.col("r._n")).cast("double")
    )
    ubound = F.lit(1) + F.least(
        F.col("l._n") - F.col("l._rn"), F.col("r._n") - F.col("r._rn")
    )
    cands = (
        l.join(
            r,
            (F.col("l._s") == F.col("r._s"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (F.col("l._n") * F.lit(threshold) <= F.col("r._n") + F.lit(_BOUND_EPS))
            & (F.col("r._n") * F.lit(threshold) <= F.col("l._n") + F.lit(_BOUND_EPS))
            & (ubound >= alpha),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("sh_b"))
    pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", _jaccard_expr().alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return pairs


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_words: int = 8,
) -> DataFrame:
    """Corpus-level segment dedup with document reconstruction — the
    C4/RefinedWeb "remove duplicated lines across the corpus" pass,
    expressed over fixed ``segment_words``-word segments (this corpus has
    no newline structure).  First occurrence wins, globally and
    deterministically: a segment survives in the document/position with
    the smallest ``(doc_id, position)``.

    Scale shape (100 TB): two map-combinable hash aggregations and one
    equi-join — segment ownership is ``min()`` over a packed
    ``doc_id * 2^20 + position`` rank (no windows, no global sort); the
    winners set joins back to the exploded segments on the segment key,
    and documents reassemble with ``sort_array(collect_list(...))`` per
    doc.  Skew: segment keys are near-unique outside pathological
    boilerplate; AQE handles residual hot keys.
    """
    # project the split ONCE: the segment lambda then slices an attribute
    # instead of re-splitting the document per segment (the HOF-inlining
    # pitfall — captured expressions re-evaluate per array element)
    with_words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_w")
    )
    wcol = F.col("_w")
    n_seg = F.ceil(F.size(wcol) / F.lit(segment_words)).cast("int")
    segments = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(wcol, i * segment_words + 1, segment_words), " "
        ),
    )
    exploded = with_words.select(
        F.col(id_col), F.posexplode(segments).alias("pos", "segment")
    )
    # packed global rank: doc_id * 2^20 + pos (pos < 2^20 for any document
    # this pipeline chunks; the pack keeps min() a single long aggregate)
    ranked = exploded.withColumn(
        "rank", F.col(id_col).cast("long") * F.lit(1 << 20) + F.col("pos")
    )
    winners = ranked.groupBy("segment").agg(F.min("rank").alias("min_rank"))
    kept = (
        ranked.join(winners, "segment")
        .where(F.col("rank") == F.col("min_rank"))
        .select(id_col, "pos", "segment")
    )
    return (
        ranked.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_segments"))
        .join(
            kept.groupBy(id_col).agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "segment"))
                        ),
                        lambda s: s["segment"],
                    ),
                    " ",
                ).alias("dedup_text"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "n_segments",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
        )
    )


def dedup_against_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_new: Column,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup screening: test each NEW document against an
    existing INDEX corpus — the streaming-ingestion pattern (a landed batch
    must not re-admit near-copies of the corpus it joins), distinct from
    :func:`near_dup_pairs`' all-pairs-within-one-set shape.

    The MinHash signature subtree is computed ONCE over the union and
    persisted; the LSH band join then runs NEW × INDEX only (no new-new or
    index-index candidates), exact n-gram Jaccard verifies, and each new
    document keeps its best match (max Jaccard, min index id tie-break).

    Scale shape: one banded equi-join keyed by (band, bucket) — at 100 TB
    the index side's bands are a materialized table the batch probes; here
    both derive from one frame.  Returns one row per NEW document:
    (id, is_dup, dup_of, jaccard).
    """

    from stellar_etl_spark.operators.util import fan_out_small

    base = fan_out_small(df.select(F.col(id_col), F.col(text_col), is_new.alias("_new")))
    with_sh = (
        base.select(
            F.col(id_col),
            F.col("_new"),
            shingles(F.col(text_col), n).alias("shingle_set"),
        )
        .withColumn(
            "_base_hashes",
            F.transform(
                F.col("shingle_set"),
                lambda s: _hex15_to_long(F.md5(s)) % MINHASH_PRIME,
            ),
        )
        .withColumn(
            "minhash_sig", minhash_from_hashes(F.col("_base_hashes"), num_perm)
        )
        .drop("_base_hashes")
    )
    # empty-set filter above the cut — below it the predicate pushes into
    # the scan stage and re-derives the shingle chain pre-fan-out (see
    # near_dup_pairs)
    with_sh = lineage_cut(with_sh, eager=True, reliable=False).where(
        F.size("shingle_set") > 0
    )

    banded = with_sh.select(
        F.col(id_col),
        F.col("_new"),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(b),
                            *[
                                F.element_at(
                                    "minhash_sig", b * rows_per_band + r + 1
                                )
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_key"),
    )
    new_b = banded.where(F.col("_new")).select(
        F.col(id_col).alias("_nid"), "band_id", "band_key"
    )
    idx_b = banded.where(~F.col("_new")).select(
        F.col(id_col).alias("_iid"), "band_id", "band_key"
    )
    cands = new_b.join(idx_b, ["band_id", "band_key"]).select(
        "_nid", "_iid"
    ).distinct()

    sh_new = with_sh.where(F.col("_new")).select(
        F.col(id_col).alias("_nid"), F.col("shingle_set").alias("sh_n")
    )
    sh_idx = with_sh.where(~F.col("_new")).select(
        F.col(id_col).alias("_iid"), F.col("shingle_set").alias("sh_i")
    )
    verified = (
        cands.join(sh_new, "_nid")
        .join(sh_idx, "_iid")
        .select(
            "_nid",
            "_iid",
            # |∩|/(|A|+|B|−|∩|): one set pass, identical ratio — see
            # _jaccard_expr (arrays are distinct by construction)
            (
                F.size(F.array_intersect("sh_n", "sh_i")).cast("double")
                / (
                    F.size("sh_n") + F.size("sh_i")
                    - F.size(F.array_intersect("sh_n", "sh_i"))
                ).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    best = verified.groupBy("_nid").agg(
        F.max(
            F.struct(F.col("jaccard"), (-F.col("_iid")).alias("_neg"))
        ).alias("_b")
    )
    news = base.where(F.col("_new")).select(F.col(id_col))
    screened = news.join(
        best.select(
            F.col("_nid").alias(id_col),
            (-F.col("_b")["_neg"]).alias("dup_of"),
            F.col("_b")["jaccard"].alias("jaccard"),
        ),
        id_col,
        "left",
    ).select(
        F.col(id_col),
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
        "jaccard",
    )
    return screened


def dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact repeated-substring detection (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" shape, at word grain):
    every word ``n``-gram that occurs more than once ANYWHERE in the corpus
    marks its occurrences; per document, overlapping/adjacent marked
    windows merge into maximal duplicated spans.

    Returns one row per document that contains at least one duplicated
    window: ``(id, n_spans, dup_words)`` where ``dup_words`` is the total
    word count covered by merged spans.

    Scale shape: positional shingles explode (narrow), one hash-aggregate
    on the 128-bit gram digest to find global ``count > 1`` grams (map-side
    combinable), a semi-join back on the digest (AQE handles hot grams —
    boilerplate n-grams are exactly the skewed keys), then the span merge
    is a per-document gaps-and-islands window — partitioned by document id,
    never global.  No driver state; the heavy shuffle is the digest
    aggregate, keyed uniformly by md5.
    """
    words = tokenize_words(F.col(text_col))
    gram_arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_w") - (n - 1), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(F.col("_w"), i, n), " ")),
    )
    grams = (
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            words.alias("_w"),
        )
        .select(
            "_id",
            F.posexplode(
                F.when(F.size("_w") >= n, gram_arr).otherwise(
                    F.slice(F.col("_w"), 1, 0)
                )
            ).alias("pos", "_g"),
        )
    )
    dup_grams = (
        grams.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") > 1)
        .select("_g")
    )
    hits = grams.join(dup_grams, "_g").select("_id", "pos")

    w = Window.partitionBy("_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "_new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = flagged.groupBy("_id", "_island").agg(
        (F.max(F.col("pos") + n) - F.min("pos")).alias("_span_words")
    )
    return spans.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("_span_words").cast("long").alias("dup_words"),
    )


def _bloom_positions(key: Column, m: int, k: int) -> Column:
    """``k`` bit positions for ``key`` from disjoint 8-hex-char (32-bit)
    slices of ONE md5 digest — a single digest per key keeps the map stage
    cheap, and each slice is an independent uniform 32-bit hash.  Requires
    ``k <= 4`` (md5 yields 32 hex chars)."""
    assert k <= 4, "md5 provides four disjoint 32-bit slices"
    hx = F.md5(key)
    return F.array(
        *[
            (F.conv(F.substring(hx, 1 + 8 * i, 8), 16, 10).cast("long") % m)
            for i in range(k)
        ]
    )


def bloom_screen(
    build: DataFrame,
    probe: DataFrame,
    id_col: str,
    key_col: str,
    m: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter membership screen: flag probe rows whose ``key_col``
    *may* exist in ``build`` (no false negatives; false-positive rate set
    by m/k vs the build cardinality).

    The filter is materialized as the DISTINCT set of occupied bit
    positions (<= ``m`` rows) — broadcast to every probe task, so the
    probe side is one narrow x``k`` explode plus a broadcast join: no
    shuffle of the corpus.  At 100 TB you raise ``m`` (10^9 bits is still
    a broadcastable packed bitmap; the plan shape — build-side bit
    aggregate + broadcast probe join — is unchanged).  This is the cheap
    first-pass screen in an incremental-ingest dedup: only bloom hits
    proceed to the exact (shuffling) membership join.

    Returns one row per probe row: ``id_col``, ``n_set_hits`` (how many of
    the k positions are occupied), ``bloom_hit`` (all k occupied).
    """
    bits = (
        build.select(
            F.explode(_bloom_positions(F.col(key_col), m, k)).alias("pos")
        )
        .distinct()
        .withColumn("_in", F.lit(1))
    )
    probed = probe.select(
        F.col(id_col),
        F.explode(_bloom_positions(F.col(key_col), m, k)).alias("pos"),
    )
    return (
        probed.join(F.broadcast(bits), "pos", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("_in").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_set_hits")
        )
        .withColumn("bloom_hit", F.col("n_set_hits") == F.lit(k))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """DIRECTED n-gram containment join: pairs where C(A→B) =
    |A∩B| / |A| ≥ t — the asymmetric near-dup measure that catches
    quotations and sub-documents Jaccard misses (a short doc fully embedded
    in a long one has tiny Jaccard but containment 1).

    Candidate completeness (prefix filter, containment form): if
    C(A→B) ≥ t then A shares at least one of its
    ``|A| − ceil(t·|A|) + 1`` rarest shingles with B — so joining A's
    PREFIX against B's FULL shingle stream misses nothing; the
    ``|B| ≥ t·|A|`` size bound prunes before exact verification.  Same
    explode → count → equi-join shape as the Jaccard member; the right
    side carries full shingle volume (the price of asymmetry).  The
    containment itself is an exact integer ratio."""
    from pyspark.sql.window import Window

    from stellar_etl_spark.operators.util import exact_ratio_round6, fan_out_small

    # empty-set filter above the cut — below it the predicate pushes into
    # the scan stage and re-derives the shingle chain pre-fan-out (see
    # near_dup_pairs)
    sh = lineage_cut(
        fan_out_small(df).select(
            F.col(id_col), shingles(F.col(text_col), n).alias("shingle_set")
        ),
        eager=True,
        reliable=False,
    ).where(F.size("shingle_set") > 0)
    ex = sh.select(
        F.col(id_col),
        F.size("shingle_set").alias("_n"),
        F.explode("shingle_set").alias("_s"),
    )
    freq = ex.groupBy("_s").agg(F.count(F.lit(1)).alias("_c"))
    prefix_len = (
        F.col("_n")
        - _ceil_bound(F.lit(threshold) * F.col("_n")).cast("long")
        + F.lit(1)
    )
    rn = F.row_number().over(Window.partitionBy(id_col).orderBy("_c", "_s"))
    # rank EVERY shingle occurrence once (the window the prefix cut needs
    # anyway); the full right-hand stream reuses the same ranked frame so
    # the positional filter below costs no extra pass
    ranked = ex.join(freq, "_s").withColumn("_rn", rn)
    prefix = ranked.where(F.col("_rn") <= prefix_len).select(
        F.col(id_col), F.col("_s"), F.col("_n"), F.col("_rn")
    )
    full = ranked.select(
        F.col(id_col).alias("id_b"),
        "_s",
        F.col("_n").alias("_nb"),
        F.col("_rn").alias("_rnb"),
    )
    # positional filter, containment form: a match at ranks (i, j) bounds
    # the overlap at 1 + min(|A|−i, |B|−j) (shared shingles sort after it
    # on both sides in the same global order), and C(A→B) ≥ t needs
    # overlap ≥ ceil(t·|A|); the first shared prefix shingle of any truly
    # contained pair always passes, so candidates stay complete
    ubound = F.lit(1) + F.least(
        F.col("l._n") - F.col("l._rn"), F.col("_nb") - F.col("_rnb")
    )
    alpha = _ceil_bound(F.lit(threshold) * F.col("l._n").cast("double"))
    cands = (
        prefix.alias("l")
        .join(
            full,
            (F.col("l._s") == full["_s"])
            & (F.col(f"l.{id_col}") != F.col("id_b"))
            & (
                full["_nb"] + F.lit(_BOUND_EPS)
                >= F.lit(threshold) * F.col("l._n")
            )
            & (ubound >= alpha),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col("id_b"))
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("sh_a").cast("long").alias("n_a"),
            inter.cast("long").alias("n_common"),
            exact_ratio_round6(inter, F.size("sh_a")).alias("containment"),
        )
        # filter on the round6-exact value so both engines cut identically
        .where(F.col("containment") >= F.lit(threshold))
    )
    return pairs


def minhash_calibration(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash estimator calibration curve: for every LSH candidate pair,
    the estimated similarity (matching signature slots / num_perm) bucketed
    against the EXACT n-gram Jaccard — the measurement that justifies (or
    re-tunes) the banding parameters on a new corpus.  Output: one row per
    match-count bucket with pair count and the exact mean Jaccard (sums of
    per-pair scaled exact ratios — no float accumulation)."""

    from stellar_etl_spark.operators.util import exact_ratio_round6_wide, fan_out_small

    base = fan_out_small(df)
    with_sh = (
        base.select(F.col(id_col), shingles(F.col(text_col), n).alias("shingle_set"))
        .withColumn(
            "_base_hashes",
            F.transform(
                F.col("shingle_set"),
                lambda s: _hex15_to_long(F.md5(s)) % MINHASH_PRIME,
            ),
        )
        .withColumn(
            "minhash_sig", minhash_from_hashes(F.col("_base_hashes"), num_perm)
        )
        .drop("_base_hashes")
    )
    # empty/NULL shingle sets carry no signal and would 0/0 in the
    # exact-Jaccard column; the oracle's sig CTE filters them too.  Filter
    # above the cut so it cannot push into the scan stage and re-derive
    # the shingle chain pre-fan-out (see near_dup_pairs).
    with_sh = lineage_cut(with_sh, eager=True, reliable=False).where(
        F.size("shingle_set") > 0
    )
    cands = minhash_lsh_candidates(
        with_sh, id_col, "minhash_sig", bands, rows_per_band
    )
    a = with_sh.select(
        F.col(id_col).alias("id_a"),
        F.col("shingle_set").alias("sh_a"),
        F.col("minhash_sig").alias("ms_a"),
    )
    b = with_sh.select(
        F.col(id_col).alias("id_b"),
        F.col("shingle_set").alias("sh_b"),
        F.col("minhash_sig").alias("ms_b"),
    )
    est = F.size(
        F.filter(
            F.zip_with("ms_a", "ms_b", lambda x, y: x == y), lambda v: v
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    # |∪| = |A|+|B|−|∩| exactly (distinct shingle arrays) — one set pass
    # instead of two, bit-identical counts (see _jaccard_expr)
    union = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    j_scaled = F.expr(
        "(( _inter * 2000000 + _union) div (2 * _union))"
    )
    pairs = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_inter", inter)
        .withColumn("_union", union)
        .select(
            est.alias("est_matches"),
            j_scaled.cast("long").alias("_js"),
        )
    )
    curve = pairs.groupBy("est_matches").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_js").cast("long").alias("_sj"),
    ).select(
        F.col("est_matches").cast("long").alias("est_matches"),
        "n_pairs",
        exact_ratio_round6_wide(
            F.col("_sj"), F.col("n_pairs") * 1_000_000
        ).alias("mean_exact_jaccard"),
    )
    return curve
