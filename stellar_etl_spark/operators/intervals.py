"""Interval (range) joins by bucket decomposition.

Spark has no native range-join strategy: ``l JOIN r ON ts BETWEEN a AND b``
plans as a broadcast-nested-loop or a degenerate sort-merge — quadratic per
key.  The scalable formulation decomposes time into fixed-width buckets:
replicate each interval into every bucket it spans, put each point in its
single bucket, and equi-join on the bucket id (plus any real equi keys).
Candidates are then verified with the exact range predicate.  Each
(point, interval) pair can only meet in the point's one bucket, so the
output needs no dedup.

Cost model: an interval spanning w microseconds is replicated
``w / bucket_us + 1`` times; the join is a plain hash/sort-merge equi-join
on (keys, bucket).  Pick ``bucket_us`` near the typical interval width so
replication stays O(1) per interval.  Skew = densely populated windows —
ordinary AQE skew-join territory, not a planner gap.

Reference parity: the reference's only time-range computation is
time→ledger-range resolution (/root/reference/internal/input/
ledger_range.go:101-194) and fixed 64-ledger batch windows
(/root/reference/internal/input/changes.go:162-180); these operators
generalize both to data-driven intervals (sessions) at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point to every interval containing it (``start <= ts
    <= end``), optionally also matching on equi ``keys``.  For LEFT
    semantics (keep empty intervals), aggregate this result and left-join it
    back to the interval table — the bucket replicas make a direct outer
    join ambiguous.
    """
    keys = keys or []
    # `div` (integer division) — a double divide + floor can round q = n - eps
    # up to n at bucket boundaries
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_us}"),
                F.expr(f"{end_col} div {bucket_us}"),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.expr(f"{point_ts} div {bucket_us}"))
    cond = [F.col(f"i.{k}") == F.col(f"p.{k}") for k in keys] + [
        F.col("i._bucket") == F.col("p._bucket"),
        F.col(f"p.{point_ts}") >= F.col(f"i.{start_col}"),
        F.col(f"p.{point_ts}") <= F.col(f"i.{end_col}"),
    ]
    joined = ivals.alias("i").join(pts.alias("p"), _and_all(cond))
    i_cols = [F.col(f"i.{c}") for c in intervals.columns]
    p_cols = [
        F.col(f"p.{c}").alias(c if c not in intervals.columns else f"point_{c}")
        for c in points.columns
        if c not in keys
    ]
    return joined.select(*i_cols, *p_cols)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def interval_overlap_count(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int,
    count_alias: str = "n_active",
) -> DataFrame:
    """Concurrency profile: for every fixed ``bucket_us`` window, the number
    of intervals overlapping it.  One explode + one count aggregate (partial
    combine) — the streaming-friendly way to ask "how many sessions were
    active at minute m" without a self-join.
    """
    return (
        intervals.select(
            F.explode(
                F.sequence(
                    F.expr(f"{start_col} div {bucket_us}"),
                    F.expr(f"{end_col} div {bucket_us}"),
                )
            ).alias("window_idx")
        )
        .groupBy("window_idx")
        .agg(F.count(F.lit(1)).alias(count_alias))
        .select(
            "window_idx",
            (F.col("window_idx") * bucket_us).alias("window_start_us"),
            count_alias,
        )
    )
