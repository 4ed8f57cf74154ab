"""Sources & sinks: bronze ledger-file ingestion and the reference's export
surface (JSONL / Parquet / batch-partitioned files)."""

from stellar_etl_spark.sources.bronze import (
    decode_ledger_files,
    fake_lcm_decoder,
    read_ledger_files,
    real_lcm_decoder,
    write_bronze,
)
from stellar_etl_spark.sources.sinks import (
    batch_dir_name,
    export_batches,
    export_jsonl,
    export_parquet,
    export_with_stats,
    transform_stats,
)

__all__ = [
    "batch_dir_name",
    "decode_ledger_files",
    "export_batches",
    "export_jsonl",
    "export_parquet",
    "export_with_stats",
    "fake_lcm_decoder",
    "read_ledger_files",
    "real_lcm_decoder",
    "transform_stats",
    "write_bronze",
]
