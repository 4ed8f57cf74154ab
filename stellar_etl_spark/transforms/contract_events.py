"""contract_events projection (reference: internal/transform/
contract_events.go:20-104): contract- vs diagnostic-event filter
(operation.go:1886-1905) and dual topic/data serialization."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.toid import toid


def transform_contract_events(
    events: DataFrame, contract_only: bool = True
) -> DataFrame:
    """One row per contract event; diagnostic events filtered out by default
    (filterEvents, operation.go:1886-1905)."""
    src = events
    if contract_only:
        src = src.where(F.col("event_type") == "contract")
    return src.select(
        toid(F.col("ledger_sequence"), F.col("tx_index"), 0).alias("transaction_id"),
        F.col("transaction_hash"),
        F.col("ledger_sequence"),
        F.col("contract_id"),
        F.col("event_type").alias("type_string"),
        F.col("in_successful_contract_call"),
        F.col("tx_successful").alias("successful"),
        F.col("topics"),
        F.col("data").alias("data_xdr"),
    )
