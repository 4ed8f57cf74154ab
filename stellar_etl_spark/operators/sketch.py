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
