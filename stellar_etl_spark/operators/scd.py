"""SCD2 (slowly-changing-dimension) history from a change stream.

The reference's changes family exports the *latest* state per ledger key
per batch (ChangeCompactor, /root/reference/internal/input/changes.go:
104-151).  The warehouse-side complement is the full validity history:
every state a key ever held, with ``[valid_from, valid_to)`` intervals and
an ``is_current`` marker — what downstream dimensional models (accounts,
trustlines, offers over time) are built from.

Shape: one window pass per key ordered by change time — ``lead`` supplies
each row's expiry.  One shuffle on the key, per-key partitions bounded by a
key's change count; no state, no joins.  Composes with ``asof_join``
(operators/asof.py) for point-in-time lookups against the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Stamp each change row with its validity interval: ``valid_from`` =
    its own timestamp, ``valid_to`` = the next change's timestamp for the
    same key (NULL while current), ``is_current`` on the latest row.
    ``order_cols`` breaks timestamp ties deterministically.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(order_cols or []))
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn(
            "is_current",
            F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
    )
