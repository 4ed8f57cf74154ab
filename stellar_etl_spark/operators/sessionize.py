"""Event sessionization — gap-based session assignment, the standard
event-stream operator a training-data/analytics pipeline needs next to the
reference's 64-ledger batching (which is fixed-width; sessions are
data-driven widths).

Shape: one shuffle on the user key; per-user windows are bounded (a user's
events), so the lag + running-sum pattern scales to any corpus. The
streaming twin is ``applyInPandasWithState`` with session timeouts — batch
semantics here are the backfill-exact reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    order_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Assign ``session_idx`` (1-based per user) by time gaps: a new session
    starts when the previous event is more than ``gap_us`` earlier."""
    w = Window.partitionBy(user_col).orderBy(ts_us_col, order_col)
    prev = F.lag(F.col(ts_us_col)).over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col(ts_us_col) - prev) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_us_col, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(new_sess).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    order_col: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """One row per session: bounds, length, event count."""
    s = sessionize(events, user_col, ts_us_col, order_col, gap_us)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_us_col).alias("session_start_us"),
        F.max(ts_us_col).alias("session_end_us"),
        (F.max(ts_us_col) - F.min(ts_us_col)).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
