"""As-of (temporal) join — the classic time-series lookup Spark's joins
don't express directly.

Reference parity: the reference performs exactly this lookup *inside* one
transaction — a trade's sell price comes from the last matching pre-change
at or before the claim atom, found by reverse scan
(/root/reference/internal/transform/trade.go:281-304) — and the time→ledger
range resolver picks the latest ledger closed at-or-before a timestamp
(/root/reference/internal/input/ledger_range.go:101-194).  This operator
generalizes both to a cross-table temporal join: for every left row, the
single right row with the greatest ``right_ts <= left_ts`` (backward; ties
on equal timestamps match, as in DuckDB/pandas ASOF) or the smallest
``right_ts >= left_ts`` (forward), per join key.

Scale shape: the naive formulation is a range join (``l.ts >= r.ts``) whose
sort-merge degenerates to per-key cross products.  Instead we interleave:
union both sides tagged by origin, sort once per key by (ts, side), and take
``last(right_payload, ignorenulls=True)`` over an unbounded-preceding window.
That is ONE shuffle on the key and one per-partition sort — the same cost as
a plain sort-merge join — independent of how many right rows precede each
left row.  No per-key state lives on the driver; skewed keys behave like any
skewed window (AQE/salting applies upstream if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """Left as-of join: every left row, plus the temporally nearest right row
    per key (NULL-padded when none qualifies — LEFT OUTER semantics).

    ``tolerance`` (same units as the ts columns) drops matches farther than
    that from the left timestamp.  Right payload columns are prefixed with
    ``right_prefix``; key columns keep their names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    r_payload = [c for c in right.columns if c not in keys]
    l_payload = [c for c in left.columns if c not in keys]
    r_struct = F.struct(*[F.col(c) for c in r_payload])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in l_payload]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in l_payload]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_l"),
        r_struct.alias("_r"),
    )

    # At equal _ts the right row sorts first (0 < 1) in BOTH directions, so
    # equality is inclusive, matching DuckDB ASOF / pandas merge_asof.
    order = (
        [F.col("_ts").asc(), F.col("_is_left").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_is_left").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )

    if tolerance is not None:
        gap = (
            F.col("_ts") - F.col(f"_m.{right_ts}")
            if direction == "backward"
            else F.col(f"_m.{right_ts}") - F.col("_ts")
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance), F.col("_m"))
        )

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"_l.{c}").alias(c) for c in l_payload]
        + [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in r_payload]
    )
    return matched.select(*out_cols)
