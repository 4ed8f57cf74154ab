"""Structured Streaming surface: unbounded change export parity."""

from stellar_etl_spark.streaming.micro_batch import (
    batch_id_col,
    read_change_stream,
    stream_compacted_changes,
)

__all__ = ["batch_id_col", "read_change_stream", "stream_compacted_changes"]
