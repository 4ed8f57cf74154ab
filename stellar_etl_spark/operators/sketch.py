"""Approximate aggregates — the 100 TB fallback for exact profiling.

The exact operators these approximate live elsewhere in the registry
(`corpus_stats_by_source` exact percentiles, `tpch_q16` count-distinct,
`top_bigrams` exact heavy hitters).  Exact distinct/percentile needs either
a full shuffle of the distinct values or a single-pass sort; at 100 TB the
sketch versions trade bounded relative error for one map-side-mergeable
pass:

- ``approx_count_distinct`` — HyperLogLog++, default rsd 5%; the sketch is
  a few KB per group and merges associatively (partial aggregation works).
- ``approx_percentile`` — a quantile summary (KLL-style) with a tunable
  accuracy/size knob; also merge-friendly.

Approximate results are engine-specific by construction (DuckDB's HLL and
Spark's HLL++ differ), so these are **test-verified against their exact
twins with error bounds**, not oracle-hashed — the one operator family
where a bitwise cross-engine check is the wrong contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_corpus_profile(
    events: DataFrame,
    group_col: str = "event_type",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate profile: HLL++ distinct users, sketched value
    percentiles — one pass, partial-aggregated, no distinct-value shuffle."""
    return events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias(
            "value_p50_p90_p99"
        ),
    )


def kmv_source_overlap(
    docs: DataFrame,
    k: int = 64,
    shingle_n: int = 3,
    survivor_bits: int = 2,
) -> DataFrame:
    """Pairwise source-overlap estimation from k-minimum-values sketches,
    audited against the exact Jaccard (KMV: Beyer et al., SIGMOD'07).

    Per source, the sketch is the ``k`` smallest 60-bit shingle hashes.
    The scale trick is the *threshold pre-filter*: hashes are uniform, so
    keeping only ``h < 2^60 / 2^survivor_bits`` bounds the per-source
    candidate set long before the per-group top-k window — the window
    sorts survivors, never the full shingle stream.  At 100 TB you raise
    ``survivor_bits`` until survivors-per-source is O(k·safety); the
    plan shape is unchanged.  Pair expansion joins the tiny sketch rows
    (k per source) against the source-pair list — cost O(pairs·k), not
    corpus-sized.

    For each pair the estimator is the textbook KMV union trick:
    bottom-k of (sketch(A) union sketch(B)) is exactly sketch of
    (A union B); the fraction of those k present in BOTH sketches is an
    unbiased Jaccard estimate.  The exact intersection/union audit
    (``n_inter``/``j_exact``) is the expensive truth path, kept here so
    the estimator error is visible in the output — in production you run
    the sketch side only.

    This cross-engine-deterministic KMV complements the engine-specific
    HLL++/KLL sketches above: same sketch-vs-exact contract, but the md5
    hash family makes the DuckDB oracle reproduce it bit-for-bit.
    """
    from stellar_etl_spark.operators.dedup import _hex15_to_long, shingles
    from stellar_etl_spark.operators.util import exact_ratio_round6

    sh = docs.select(
        F.col("source"),
        F.explode(shingles(F.col("text"), shingle_n)).alias("g"),
    ).distinct()
    hashed = sh.select(
        "source", _hex15_to_long(F.md5(F.col("g"))).alias("h")
    )
    surv = hashed.where(F.col("h") < F.lit(1 << (60 - survivor_bits)))

    from pyspark.sql.window import Window

    per_src = Window.partitionBy("source").orderBy("h")
    sk = (
        surv.withColumn("_rn", F.row_number().over(per_src))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )

    srcs = docs.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(
            srcs.alias("b"),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
    )
    side1 = pairs.join(
        sk.alias("x"), F.col("x.source") == F.col("s1")
    ).select(
        "s1",
        "s2",
        F.col("x.h").alias("h"),
        F.lit(1).alias("in1"),
        F.lit(0).alias("in2"),
    )
    side2 = pairs.join(
        sk.alias("y"), F.col("y.source") == F.col("s2")
    ).select(
        "s1",
        "s2",
        F.col("y.h").alias("h"),
        F.lit(0).alias("in1"),
        F.lit(1).alias("in2"),
    )
    merged = (
        side1.union(side2)
        .groupBy("s1", "s2", "h")
        .agg(F.max("in1").alias("in1"), F.max("in2").alias("in2"))
    )
    per_pair = Window.partitionBy("s1", "s2").orderBy("h")
    est = (
        merged.withColumn("_rn", F.row_number().over(per_pair))
        .where(F.col("_rn") <= k)
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_union"),
            F.sum(F.col("in1") * F.col("in2")).cast("long").alias("n_both"),
        )
    )

    inter = (
        sh.alias("ia")
        .join(
            sh.alias("ib"),
            (F.col("ia.g") == F.col("ib.g"))
            & (F.col("ia.source") < F.col("ib.source")),
        )
        .groupBy(
            F.col("ia.source").alias("s1"), F.col("ib.source").alias("s2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sizes = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0)).cast("long")
    return (
        est.join(inter, ["s1", "s2"], "left")
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
            ),
            "s1",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
            ),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "k_union",
            "n_both",
            exact_ratio_round6("n_both", "k_union").alias("j_est"),
            n_inter.alias("n_inter"),
            exact_ratio_round6(
                n_inter, F.col("n1") + F.col("n2") - n_inter
            ).alias("j_exact"),
        )
    )
