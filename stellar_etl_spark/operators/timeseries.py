"""Hypertable-style time-series operators: dense time grids and
last-observation-carried-forward (LOCF) interpolation.

A time-bucketed aggregate leaves holes where no rows landed; downstream
consumers (charting, feature windows, rate-of-change) need a dense grid.
``gapfill_locf`` densifies per key between that key's first and last
observed bucket and carries the last observed value forward — the
TimescaleDB ``time_bucket_gapfill + locf`` semantics as a composition of
built-in ops.

Scale shape: the grid is generated with ``sequence`` + ``explode`` from a
tiny per-key bounds aggregate (|keys| rows), the observed/grid alignment is
an equi-join on (key, bucket), and LOCF is one window pass per key ordered
by bucket — one shuffle each, all JVM-side.  Grid size is
``range / bucket`` per key: pick the bucket so the per-key grid stays
bounded (it is a *display/feature* grain, not the raw event grain).

Reference parity: the reference's fixed 64-ledger batch windows
(/root/reference/internal/input/changes.go:162-180) are a degenerate dense
grid (ledger sequences have no holes); this generalizes to real time where
holes exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    bucket_col: str,
    value_cols: list[str],
    keys: list[str],
    gap_flag: str = "is_gap",
) -> DataFrame:
    """Densify ``df`` (one row per (keys, bucket)) to every bucket between
    each key's min and max, filling ``value_cols`` by LOCF.  Adds
    ``gap_flag`` = 1 on synthesized rows.  The first grid row per key is
    always observed (the grid starts at the observed min), so LOCF never
    reads an empty history.
    """
    bounds = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias(bucket_col)
    )
    aligned = grid.join(
        df.withColumn("_obs", F.lit(1)), [*keys, bucket_col], "left"
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = aligned.withColumn(
        gap_flag,
        F.when(F.col("_obs").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.drop("_obs")
