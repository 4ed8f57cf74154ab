"""Streaming corpus ingestion: quality-gate + incremental near-dup screen.

The training-data twin of the ledger CDC stream (micro_batch.py): documents
land in micro-batches, each batch is (1) scored by the hashed-ngram quality
classifier and (2) near-dup screened against the ACCEPTED corpus as of the
batch start, and survivors are appended to the corpus.  ``foreachBatch``
applies the SAME batch operators (hashed_ngram_score, dedup_against_index),
so streaming==batch parity is testable by replaying the batches in a loop —
the repo-wide streaming pattern.

Scale stance: the per-batch work is one classifier projection plus one
banded NEW×INDEX LSH join (never index×index); the index side is a
materialized parquet table the batch probes, exactly the deployment shape.
Exactly-once: each micro-batch's admitted rows land under an
``epoch=<epoch_id>`` partition directory with OVERWRITE semantics, so a
replayed epoch (failure between the write and the checkpoint commit)
rewrites its own directory instead of appending duplicates — the same
idempotence discipline as streaming/agg_maintenance.py.  The index is read
from the partitioned root, so partition discovery unions the epoch dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def ingest_batch(
    batch_df: DataFrame,
    index_df: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One ingestion step: quality-gate ``batch_df``, then drop near-dups
    of ``index_df`` (None = empty corpus).  Returns the admitted rows
    (id, text).  Pure batch code — shared verbatim by the streaming path
    and the loop-replay twin."""
    from stellar_etl_spark.operators.dedup import dedup_against_index
    from stellar_etl_spark.operators.text import hashed_ngram_score

    scored = hashed_ngram_score(batch_df, id_col=id_col, text_col=text_col)
    kept = batch_df.select(id_col, text_col).join(
        scored.where(F.col("keep")).select(id_col), id_col
    )
    if index_df is None:
        return kept
    unioned = index_df.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("_new")
    ).unionByName(
        kept.select(F.col(id_col), F.col(text_col), F.lit(True).alias("_new"))
    )
    verdict = dedup_against_index(
        unioned, id_col, text_col, is_new=F.col("_new")
    )
    return kept.join(
        verdict.where(~F.col("is_dup")).select(id_col), id_col
    )


def stream_ingest_corpus(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Run the ingestion as a Structured Streaming query: each micro-batch
    is screened against the corpus parquet at ``index_dir`` as of batch
    start, and survivors are appended there."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            index = spark.read.parquet(index_dir).select(id_col, text_col)
            if not index.head(1):
                index = None
        except Exception:
            index = None
        admitted = ingest_batch(
            batch_df, index, id_col=id_col, text_col=text_col
        )
        # epoch-keyed overwrite = replay-idempotent: a re-run of this epoch
        # after a crash-before-commit replaces its own partition instead of
        # double-appending the batch into the corpus
        admitted.write.mode("overwrite").parquet(
            f"{index_dir}/epoch={int(epoch_id)}"
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
