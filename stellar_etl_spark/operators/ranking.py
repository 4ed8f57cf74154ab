"""Distributed exact ranking: ntile / row_number without a global window.

``Window.orderBy(...)`` with no partition key moves EVERY row to one task
(Spark logs "No Partition Defined for Window operation") — the canonical
scale killer for rank-based features.  The operators here produce the
IDENTICAL result through a two-phase plan that stays parallel end to end:

1. one 1-row aggregate (min / max / count) broadcast to every task;
2. map-side coarse bucketing of the sort value into ``coarse`` equal-width
   ranges (pure arithmetic — deterministic, no sampling, unlike
   ``repartitionByRange`` whose boundaries depend on an RDD-id-seeded
   sample and therefore cannot be re-derived consistently across plan
   branches);
3. a tiny per-bucket count aggregate (≤ ``coarse`` rows) turned into
   cumulative offsets with a broadcast triangular self-join — NOT a
   window, so even the offset step never serializes;
4. per-bucket ``row_number`` (parallel across buckets) + broadcast offset
   = exact global 0-based rank, then the ANSI ntile size formula
   (first ``N mod k`` buckets get one extra row).

Equal-width buckets are not equi-populated under skew, but the in-bucket
window cost is bounded by the largest value-range cluster, and any
monotone coarse split preserves correctness: the double cast used for
bucketing is order-preserving, and rows that collapse into the same
bucket are totally re-ordered there by the exact (value, *tie) key.

Cost: 3 passes over the input (stats, bucket counts, rank) — each fully
parallel, vs 1 serialized pass for the naive global window.  At 100 TB
the 3 parallel passes win by the width of the cluster.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

COARSE_BUCKETS = 1024


def _with_global_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    coarse: int = COARSE_BUCKETS,
) -> DataFrame:
    """Attach ``_r0`` (exact 0-based global rank under (value, *ties) asc)
    and ``_n`` (total row count) to every row.  Precondition: the sort key
    (value, *ties) is non-null and total (unique) — same contract a global
    ``row_number`` needs for a deterministic result."""
    v = F.col(value_col)
    stats = df.agg(
        F.min(v).alias("_lo"),
        F.max(v).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    tagged = df.crossJoin(F.broadcast(stats))
    lo, hi = F.col("_lo").cast("double"), F.col("_hi").cast("double")
    span = hi - lo
    cb = (
        F.when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(coarse - 1),
                F.floor((v.cast("double") - lo) / span * coarse),
            )
        )
        .cast("long")
    )
    tagged = tagged.withColumn("_cb", cb).drop("_lo", "_hi")

    counts = tagged.groupBy("_cb").agg(F.count(F.lit(1)).alias("_bn"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._cb") < F.col("a._cb"), "left")
        .groupBy(F.col("a._cb").alias("_cb"))
        .agg(F.coalesce(F.sum("b._bn"), F.lit(0)).alias("_off"))
    )

    wl = Window.partitionBy("_cb").orderBy(v, *[F.col(c) for c in tie_cols])
    return (
        tagged.join(F.broadcast(offsets), "_cb")
        .withColumn("_r0", F.col("_off") + F.row_number().over(wl) - 1)
        .drop("_cb", "_off")
    )


def distributed_ntile(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    k: int,
    out: str = "ntile",
    coarse: int = COARSE_BUCKETS,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY value, *ties)`` — ANSI semantics
    (first ``N mod k`` tiles hold ``ceil(N/k)`` rows, the rest
    ``floor(N/k)``), produced by the two-phase plan above."""
    ranked = _with_global_rank(df, value_col, tie_cols, coarse)
    n, r0 = F.col("_n"), F.col("_r0")
    q = F.floor(n / k)  # base tile size
    m = n % k  # tiles that get one extra row
    big = (q + 1) * m  # rows living in the oversized tiles
    bucket = (
        F.when(r0 < big, F.floor(r0 / (q + 1)) + 1)
        .otherwise(m + F.floor((r0 - big) / F.greatest(q, F.lit(1))) + 1)
        .cast("long")
    )
    return ranked.withColumn(out, bucket).drop("_n", "_r0")


def distributed_row_number(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    out: str = "rn",
    coarse: int = COARSE_BUCKETS,
) -> DataFrame:
    """Exact ``row_number() OVER (ORDER BY value, *ties)`` (1-based) with
    the same parallel two-phase plan."""
    ranked = _with_global_rank(df, value_col, tie_cols, coarse)
    return ranked.withColumn(out, (F.col("_r0") + 1).cast("long")).drop(
        "_n", "_r0"
    )


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    tie_cols: Sequence[str],
    sum_col: str | None = None,
    out: str = "cumsum",
    descending: bool = False,
    coarse: int = COARSE_BUCKETS,
) -> DataFrame:
    """Exact global running sum ``SUM(sum_col) OVER (ORDER BY value, *ties
    ROWS UNBOUNDED PRECEDING)`` — without the single-partition global
    window.  Same two-phase trick as the rank operators, but the per-bucket
    side table carries SUMS: map-side coarse bucketing, a ≤``coarse``-row
    per-bucket sum turned into broadcast prefix offsets, then a per-bucket
    running sum (parallel across buckets) + offset.

    ``descending=True`` orders by the negated (numeric) sort key — the
    Pareto/Lorenz direction (largest contributors first).  ``sum_col``
    defaults to the sort value itself.  The 1-based global rank is emitted
    alongside as ``{out}_rank`` (callers almost always need both)."""
    sum_col = sum_col or value_col
    work = df
    key = value_col
    if descending:
        key = f"_neg_{value_col}"
        work = df.withColumn(key, -F.col(value_col))
    ranked = _with_global_rank(work, key, tie_cols, coarse)
    # FIXED number of rank-range blocks (like the value-range buckets of
    # _with_global_rank): the offsets side table stays ≤``coarse`` rows at
    # any data size, per-block running sums stay parallel across blocks.
    block = F.least(
        F.lit(coarse - 1),
        F.floor(F.col("_r0") * coarse / F.greatest(F.col("_n"), F.lit(1))),
    ).cast("long")
    ranked = ranked.withColumn("_blk", block)
    bsums = ranked.groupBy("_blk").agg(F.sum(sum_col).alias("_bs"))
    a, b = bsums.alias("a"), bsums.alias("b")
    offs = (
        a.join(F.broadcast(b), F.col("b._blk") < F.col("a._blk"), "left")
        .groupBy(F.col("a._blk").alias("_blk"))
        .agg(F.coalesce(F.sum("b._bs"), F.lit(0)).alias("_soff"))
    )
    wl = Window.partitionBy("_blk").orderBy("_r0").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    result = (
        ranked.join(F.broadcast(offs), "_blk")
        .withColumn(out, (F.col("_soff") + F.sum(sum_col).over(wl)))
        .withColumn(f"{out}_rank", (F.col("_r0") + 1).cast("long"))
        .drop("_blk", "_soff", "_n", "_r0")
    )
    if descending:
        result = result.drop(key)
    return result
