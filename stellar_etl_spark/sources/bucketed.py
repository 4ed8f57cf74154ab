"""Bucketed table layout — co-located joins without a shuffle.

At 100 TB the fact⨝fact join (e.g. lineitem⨝orders on orderkey, or silver
transactions⨝operations on ledger) dominates unless both sides are stored
pre-hashed on the join key: ``bucketBy(n, key)`` at write time makes every
subsequent equi-join on that key shuffle-free (Spark plans a SortMergeJoin
over the existing bucket files — no Exchange).

The reference's analogue is the fixed datastore layout (1 ledger/file,
64 000/partition, utils/main.go:981-984): layout chosen once at write time
so reads never reorganize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) catalog table.

    Sorting within buckets additionally removes the join's Sort nodes —
    the SMJ reads both sides already ordered."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned with zero
    Exchange nodes (verify with .explain)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
