"""ChangeCompactor semantics as a window-dedup operator.

The reference compacts ledger-entry changes per batch to last-state-per-key
with create/remove reconciliation (internal/input/changes.go:104-151, using
stellar/go's ingest.ChangeCompactor):

  - multiple changes to one ledger key within a batch collapse to one;
  - the surviving row carries the LAST state (post of the last change);
  - created → ... → removed within one batch annihilates (no output row);
  - created → ... → updated stays a create (entry is new to this batch);
  - removed rows surface with ``deleted = true`` (utils/main.go:836-845).

Spark expression: a single shuffle on (key, batch) — `min`/`max_by`-style
aggregation, no window sort needed.  At 100 TB this is a map-side-combinable
hash aggregation, the cheapest possible shape for CDC compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CREATED, UPDATED, REMOVED, STATE = 0, 1, 2, 3


def compact_changes(
    changes: DataFrame,
    key_col: str = "ledger_key",
    batch_col: str = "batch_id",
    seq_col: str = "ledger_sequence",
    idx_col: str = "change_index",
    type_col: str = "change_type",
) -> DataFrame:
    """Collapse a change log to one row per (batch, key).

    Output keeps every original column of the LAST change for the key plus
    ``first_change_type``/``deleted``; created→removed pairs are dropped.
    Uses `max_by` over a strictly increasing order key — one hash aggregate,
    partial-aggregation friendly (no row_number window, no full sort).
    """
    ord_key = (
        F.shiftleft(F.col(seq_col).cast("long"), 20)
        + F.col(idx_col).cast("long")
    )
    payload = F.struct(*[F.col(c) for c in changes.columns])
    agg = (
        changes.groupBy(batch_col, key_col)
        .agg(
            F.max_by(payload, ord_key).alias("_last"),
            F.min_by(F.col(type_col), ord_key).alias("first_change_type"),
            F.max_by(F.col(type_col), ord_key).alias("last_change_type"),
        )
    )
    # created→…→removed inside one batch annihilates entirely.
    agg = agg.where(
        ~((F.col("first_change_type") == CREATED) & (F.col("last_change_type") == REMOVED))
    )
    out_cols = [F.col(f"_last.{c}").alias(c) for c in changes.columns if c not in (batch_col, key_col)]
    return agg.select(
        F.col(batch_col),
        F.col(key_col),
        *out_cols,
        # a change that began life as CREATED in this batch is still a create
        # even if later updated (ChangeCompactor rule)
        F.when(F.col("first_change_type") == CREATED, F.lit(CREATED))
        .otherwise(F.col("last_change_type"))
        .alias("effective_change_type"),
        (F.col("last_change_type") == REMOVED).alias("deleted"),
    )
