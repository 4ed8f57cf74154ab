"""Streaming incremental aggregate maintenance — the streaming twin of
``queries.incremental_agg_merge``.

Each micro-batch reduces to a per-key PARTIAL state (count / sum / min /
max — the mergeable-aggregate property), written under an
``epoch=<id>`` directory with overwrite semantics: a replayed epoch
rewrites the same directory with the same deterministic rows, so the
state store is exactly-once without any read-modify-write on the hot
path.  Readers merge the tiny per-epoch states with one re-aggregate —
at 100 TB the stream never re-touches history, and the state side stays
bounded by |keys| × |epochs| (compactable by the same merge).

This mirrors the reference's batch-file sink discipline (one
deterministically-named artifact per ledger batch, idempotent on replay
— cmd/export_ledger_entry_changes.go's {start}-{end} naming) applied to
aggregate state instead of row exports.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def partial_state(batch_df: DataFrame, key_col: str, cents_col: str) -> DataFrame:
    """Reduce a batch to its mergeable per-key partial state."""
    return batch_df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents_col).cast("long").alias("s"),
        F.min(cents_col).cast("long").alias("mn"),
        F.max(cents_col).cast("long").alias("mx"),
    )


def merge_states(states: DataFrame, key_col: str) -> DataFrame:
    """Merge any number of partial states into the total aggregate —
    associative + commutative, so epoch order doesn't matter."""
    return states.groupBy(key_col).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("s").cast("long").alias("total_cents"),
        F.min("mn").cast("long").alias("min_cents"),
        F.max("mx").cast("long").alias("max_cents"),
    )


def stream_maintain_aggregate(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    cents_col: str = "cents",
    available_now: bool = True,
):
    """Maintain the aggregate as a Structured Streaming query: one partial
    state per epoch, idempotent overwrite per epoch directory."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = os.path.join(state_dir, f"epoch={epoch_id}")
        partial_state(batch_df, key_col, cents_col).write.mode(
            "overwrite"
        ).parquet(out)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_merged_state(
    spark: SparkSession, state_dir: str, key_col: str = "event_type"
) -> DataFrame:
    """Current aggregate = one re-aggregate over all epoch partials."""
    return merge_states(spark.read.parquet(state_dir), key_col)
