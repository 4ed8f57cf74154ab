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

Exactly-once: each micro-batch's admitted rows land under a
``run=<query_id>/epoch=<epoch_id>`` partition directory with OVERWRITE
semantics.  Epoch ids are only unique within one checkpoint lineage, so the
epoch dir is namespaced by the streaming query id (read from the
checkpoint's own metadata file): a replayed epoch (failure between the
write and the checkpoint commit) rewrites its own directory instead of
appending duplicates, while a RESET checkpoint — whose epoch ids restart at
0 — gets a fresh ``run=`` namespace instead of silently deleting prior
admissions.  The index is read from the partitioned root, so partition
discovery unions every run's epoch dirs.
"""

from __future__ import annotations

import json

from pyspark.errors import AnalysisException
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


from stellar_etl_spark.streaming.fsutil import hadoop_fs, read_utf8


def _run_token(spark: SparkSession, checkpoint_dir: str) -> str:
    """The streaming query id from the checkpoint's own metadata file.

    Stable across restarts of the SAME checkpoint (replayed epochs map to
    the same dir → overwrite is idempotent) and fresh whenever the
    checkpoint is reset (epoch ids restart at 0 but land under a NEW
    ``run=`` namespace instead of clobbering prior admissions).  Spark
    writes ``<checkpoint>/metadata`` at query start, before the first
    batch, so it is always present inside ``foreachBatch``.
    """
    fs, path = hadoop_fs(spark, f"{checkpoint_dir}/metadata")
    return str(json.loads(read_utf8(spark, fs, path))["id"])


def _validate_index_layout(spark: SparkSession, index_dir: str) -> None:
    """Refuse to start over an index_dir holding non-``run=`` entries.

    A corpus written by a flat-file layout (or the pre-namespace ``epoch=``
    layout) mixed with ``run=`` dirs makes Spark's partition discovery fail
    with "conflicting directory structures" at read time — deep inside a
    micro-batch.  Failing at start() with an actionable message is the
    contract instead."""
    fs, path = hadoop_fs(spark, index_dir)
    if not fs.exists(path):
        return
    bad = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith(("run=", "_", ".")):
            continue
        bad.append(name)
    if bad:
        raise ValueError(
            f"index_dir {index_dir!r} contains non-run= entries "
            f"{sorted(bad)[:5]}: it was written by a different corpus "
            "layout. Point the stream at a fresh index_dir (or migrate the "
            "existing corpus under a run=<id>/epoch=<n>/ layout) — mixing "
            "layouts breaks parquet partition discovery."
        )


def _is_path_not_found(exc: AnalysisException) -> bool:
    cond = ""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(exc, attr, None)
        if callable(fn):
            try:
                cond = fn() or ""
            except Exception:
                cond = ""
            if cond:
                break
    return "PATH_NOT_FOUND" in cond or "PATH_NOT_FOUND" in str(exc)


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
    start, and survivors are appended there (run/epoch-keyed — see module
    docstring for the exactly-once story)."""
    spark = stream.sparkSession
    _validate_index_layout(spark, index_dir)
    token_cache: dict[str, str] = {}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if "run" not in token_cache:
            token_cache["run"] = _run_token(spark, checkpoint_dir)
        run = token_cache["run"]
        try:
            index = spark.read.parquet(index_dir)
            # A replayed epoch (crash AFTER the parquet write, BEFORE the
            # checkpoint commit) must not screen against its own crashed
            # write: the index would contain this very batch, every row
            # would be flagged a dup of itself, and the "idempotent"
            # overwrite would rewrite the epoch dir EMPTY — permanent
            # loss.  Screen only against strictly-older data: prior runs
            # entirely, and this run's earlier epochs.
            if "run" in index.columns:
                index = index.where(
                    (F.col("run") != F.lit(run))
                    | (F.col("epoch") < F.lit(int(epoch_id)))
                )
            index = index.select(id_col, text_col)
            if not index.head(1):
                index = None
        except AnalysisException as exc:
            # ONLY "corpus not written yet" means empty index; a layout or
            # schema error must surface, not silently disable the near-dup
            # screen and admit duplicates
            if not _is_path_not_found(exc):
                raise
            index = None
        admitted = ingest_batch(
            batch_df, index, id_col=id_col, text_col=text_col
        )
        # run/epoch-keyed overwrite = replay-idempotent within this
        # checkpoint lineage: a re-run of this epoch after a
        # crash-before-commit replaces its own partition instead of
        # double-appending, and a reset checkpoint writes under a new run=
        admitted.write.mode("overwrite").parquet(
            f"{index_dir}/run={run}/epoch={int(epoch_id)}"
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
