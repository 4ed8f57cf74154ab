"""Physical layout tools: Z-order (Morton) clustering for multi-dim pruning.

Parquet scans prune row groups via column min/max stats.  Sorting by one
column gives perfect pruning on that column and none on others; for scans
that filter two dimensions (e.g. ``user_id`` ranges within a time window),
interleaving the bits of both keys (Morton / Z-order curve) and sorting by
the interleaved value keeps row groups tight on BOTH columns at once — the
same technique Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``.

Implemented as a pure JVM bit expression (no UDF): each value is first
rank-bucketed to a fixed number of bits (equi-populated buckets via
``ntile``, so skewed domains still split evenly), then bits interleave with
shift/or chains.  The sort before write is one range-partitioned shuffle —
exactly the cost of any clustered write at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension (2 dims -> 32-bit z-value)


def morton_interleave(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` of two non-negative longs: result bit
    2i+1 is a's bit i, bit 2i is b's bit i.  Pure shift/or chain — stays in
    whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(abit, 2 * i + 1))
            .bitwiseOR(F.shiftleft(bbit, 2 * i))
        )
    return z


def zorder_value(df: DataFrame, col_a: str, col_b: str, bits: int = ZBITS) -> DataFrame:
    """Add ``_z``: the Morton value of the two columns' equi-populated rank
    buckets.  ntile keeps bucket occupancy flat under any value skew; the
    rank pass is the two-phase distributed ntile (operators/ranking.py),
    so the layout job itself never funnels through one task."""
    from stellar_etl_spark.operators.ranking import distributed_ntile

    nb = 1 << bits
    bucketed = distributed_ntile(df, col_a, [], nb, out="_ba")
    bucketed = distributed_ntile(bucketed, col_b, [], nb, out="_bb")
    return bucketed.withColumn(
        "_z",
        morton_interleave(
            F.col("_ba") - 1, F.col("_bb") - 1, bits
        ),
    ).drop("_ba", "_bb")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = ZBITS,
    target_files: int = 8,
) -> None:
    """Write parquet clustered on the Z-curve of (col_a, col_b):
    repartitionByRange on ``_z`` (range-partitioned shuffle) + in-partition
    sort, so every file/row-group covers a tight rectangle in both
    dimensions.  The rank-bucketing is the distributed two-phase ntile, so
    the whole layout job is shuffle-parallel at any input size."""
    z = zorder_value(df, col_a, col_b, bits)
    (
        z.repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
