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

    token_cache: dict[str, str] = {}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from stellar_etl_spark.streaming.fsutil import hadoop_fs
        from stellar_etl_spark.streaming.ingest import _run_token

        spark = batch_df.sparkSession
        if "run" not in token_cache:
            token_cache["run"] = _run_token(spark, checkpoint_dir)
            # Additive partial states tolerate NO foreign epochs: a RESET
            # checkpoint replays the source under restarted epoch ids, and
            # merging its partials with a previous run's would double-count
            # (while overwriting them with misaligned batch boundaries
            # silently corrupts).  Refuse anything in state_dir not owned
            # by THIS query id — same failure-at-start contract as
            # ingest's layout guard.
            fs, path = hadoop_fs(spark, state_dir)
            if fs.exists(path):
                foreign = [
                    st.getPath().getName()
                    for st in fs.listStatus(path)
                    if not st.getPath().getName().startswith(
                        ("_", ".", f"run={token_cache['run']}")
                    )
                ]
                if foreign:
                    raise ValueError(
                        f"state_dir {state_dir!r} holds partial state from "
                        f"another run/layout {sorted(foreign)[:3]}: merging "
                        "would double-count. Point this stream at a fresh "
                        "state_dir (or clear the old one)."
                    )
        out = os.path.join(
            state_dir, f"run={token_cache['run']}", f"epoch={epoch_id}"
        )
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
    """Current aggregate = one re-aggregate over the run's epoch partials
    (partition discovery surfaces run/epoch as columns; merge ignores
    them)."""
    return merge_states(
        spark.read.parquet(state_dir).select("*"), key_col
    )
