"""Unbounded change export as Structured Streaming (reference: ``end=0``
continuous mode, README.md:294-296 / input/changes.go:61-64,162-180).

The reference streams strictly sequential 64-ledger batches over a Go
channel; here a file-source stream reads newly landed change files and
``foreachBatch`` applies the SAME batch transforms (compaction → per-entity
projection → batch-partitioned sink) — one code path for batch and
streaming.  No watermarks/event-time: ledger sequence is a monotone
processing order (SURVEY.md §2.8), so batch boundaries are
``floor(seq / batch_size)`` exactly like the batch job.

``availableNow`` drains everything currently landed and stops (bounded
parity / backfill); ``processingTime`` keeps following the directory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stellar_etl_spark.operators.compaction import compact_changes

# Reference default --batch-size (utils/main.go:269): 64 ledgers ≈ 5 min.
DEFAULT_BATCH_LEDGERS = 64


def batch_id_col(seq_col: str = "ledger_sequence", batch_size: int = DEFAULT_BATCH_LEDGERS) -> Column:
    return (F.col(seq_col) / batch_size).cast("long")


def read_change_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over the landing directory (the datastore bucket in
    production — same API over gs:// via the Hadoop connector)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def stream_compacted_changes(
    changes_stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    batch_size: int = DEFAULT_BATCH_LEDGERS,
    available_now: bool = True,
    processing_interval: str = "300 seconds",
) -> StreamingQuery:
    """Compact each micro-batch per (64-ledger window, ledger key) and hand
    the result to ``sink(df, epoch_id)`` — which reuses the batch writers
    (sources.sinks.export_batches), keeping batch/streaming output identical.

    Compaction inside foreachBatch is plain batch code — the same
    ``compact_changes`` operator — so streaming adds zero new semantics,
    exactly like the reference reusing its batch transforms per ChangeBatch.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        with_batch = batch_df.withColumn("batch_id", batch_id_col(batch_size=batch_size))
        sink(compact_changes(with_batch), epoch_id)

    writer = (
        changes_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
