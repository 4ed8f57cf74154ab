"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small(df: DataFrame) -> DataFrame:
    """Repartition tiny inputs up to the cluster's default parallelism before
    CPU-heavy per-row work.

    Small local datasets arrive as a single partition (one parquet row
    group), which would serialize the compute on one core.  At 100 TB the
    input already has ≥ defaultParallelism partitions and this is a no-op —
    the check costs only a plan inspection, no job.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
