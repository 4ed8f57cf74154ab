"""Snapshot upsert — applying a compacted CDC batch to a state table.

The reference exports per-batch compacted changes (`{start}-{end}-{type}`
files, cmd/export_ledger_entry_changes.go:283-364); the downstream consumer
MERGEs each batch into the entity's current-state table.  This operator is
that MERGE as a pure DataFrame program: one full-outer join per batch apply,

  - ``deleted`` change  → key dropped,
  - present change      → new state (even if some state columns are null —
    presence, not null-coalescing, decides),
  - absent key          → base state carried.

Scale shape: one shuffle on the entity key (or zero with co-bucketed base
and delta — `sources/bucketed.py`); the base table is touched once per
batch.  Compaction (operators/compaction.py) has already collapsed the
batch, so the delta side is `O(distinct keys touched)`, not `O(changes)`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_snapshot(
    base: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    deleted_col: str = "deleted",
) -> DataFrame:
    """MERGE one compacted change batch into a snapshot; returns the new
    snapshot with ``key_cols + state_cols``."""
    keys = list(key_cols)
    b = base.select(
        *keys, *[F.col(c).alias(f"_base_{c}") for c in state_cols]
    )
    d = delta.select(
        *keys,
        F.col(deleted_col).alias("_del"),
        F.lit(True).alias("_has_delta"),
        *[F.col(c).alias(f"_new_{c}") for c in state_cols],
    )
    j = b.join(d, keys, "full_outer")
    live = j.where(~F.coalesce(F.col("_del"), F.lit(False)))
    return live.select(
        *keys,
        *[
            F.when(F.col("_has_delta"), F.col(f"_new_{c}"))
            .otherwise(F.col(f"_base_{c}"))
            .alias(c)
            for c in state_cols
        ],
    )
