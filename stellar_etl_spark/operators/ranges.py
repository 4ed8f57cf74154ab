"""Time → sequence range lookup.

Reference semantics (internal/input/ledger_range.go:32-68): given a UTC time
window, return the smallest ledger range fully covering it; genesis (seq 1,
close time 0) is excluded — search starts at seq 2.  The reference binary-
searches the history archive; over a ledgers/events dim table this is a plain
min/max aggregation, which Parquet aggregate-pushdown answers from footer
statistics at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ledger_range_for_times(
    ledgers: DataFrame,
    start_time,
    end_time,
    seq_col: str = "sequence",
    time_col: str = "closed_at",
    min_seq: int = 2,
) -> DataFrame:
    """Smallest [start_seq, end_seq] covering [start_time, end_time]."""
    in_window = ledgers.where(
        (F.col(time_col) >= F.lit(start_time))
        & (F.col(time_col) <= F.lit(end_time))
        & (F.col(seq_col) >= min_seq)
    )
    return in_window.agg(
        F.min(seq_col).alias("start_seq"),
        F.max(seq_col).alias("end_seq"),
        F.count(F.lit(1)).alias("n_ledgers"),
    )
