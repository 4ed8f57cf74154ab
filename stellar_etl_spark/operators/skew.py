"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions.  For *pathological* hot keys —
one key holding a double-digit share of a 100 TB fact table — explicit
salting is still the reliable tool: the fact side spreads each key across
``n_salt`` sub-keys, the (non-broadcastable) dimension side replicates
``n_salt``×, and the join runs on (key, salt) with uniform partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts ⨝ dims`` on ``on`` with ``n_salt``-way salting.

    The fact side gets a per-row salt (monotonic id — uniform and cheap;
    row-nondeterministic but join results are salt-invariant), the dim side
    is exploded once per salt value.  Output equals the plain join, with the
    hot key's work spread over ``n_salt`` reducers.
    """
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    salted_dims = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return (
        salted_facts.join(salted_dims, [on, "_salt"], how)
        .drop("_salt")
    )


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join-key skew diagnostic: the numbers that decide salting vs
    broadcast vs plain shuffle before a big join.

    One hash aggregate to per-key counts (map-side partials), then a tiny
    ``top_k`` TakeOrdered and a singleton rollup — nothing key-grain leaves
    the first aggregate.  Shares are exact integer ratios.

    Returns one row: n_keys, n_rows, max_key_rows, top1_share, topk_share.
    """
    from stellar_etl_spark.operators.util import exact_ratio_round6

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_c"))
    top = (
        counts.orderBy(F.col("_c").desc(), F.col(key_col))
        .limit(top_k)
        .agg(F.sum("_c").alias("_top_sum"), F.max("_c").alias("_top1"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("_c").alias("n_rows")
    )
    return totals.crossJoin(top).select(
        "n_keys",
        "n_rows",
        F.col("_top1").alias("max_key_rows"),
        exact_ratio_round6("_top1", "n_rows").alias("top1_share"),
        exact_ratio_round6("_top_sum", "n_rows").alias(f"top{top_k}_share"),
    )
