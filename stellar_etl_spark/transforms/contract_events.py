"""contract_events projection (reference: internal/transform/
contract_events.go:20-104): contract- vs diagnostic-event filter
(operation.go:1886-1905) and dual topic/data serialization (raw base64 XDR
plus the decoder's JSON rendering)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.toid import toid
from stellar_etl_spark.schemas import (
    CONTRACT_EVENT_TYPE_STRINGS,
    CONTRACT_EVENT_TYPES,
)


def transform_contract_events(
    events: DataFrame, contract_only: bool = True
) -> DataFrame:
    """One row per contract event; diagnostic events filtered out by default
    (filterEvents, operation.go:1886-1905).  ``type``/``type_string`` carry
    the xdr.ContractEventType discriminant + Go enum name
    (ContractEventOutput, schema.go:618-633)."""
    src = events
    if contract_only:
        src = src.where(F.col("event_type") == "contract")

    type_code = F.col("event_type")
    type_int = F.lit(None).cast("int")
    type_str = F.lit(None).cast("string")
    for name in ("system", "contract", "diagnostic"):
        type_int = F.when(type_code == name, F.lit(CONTRACT_EVENT_TYPES[name])).otherwise(type_int)
        type_str = F.when(
            type_code == name, F.lit(CONTRACT_EVENT_TYPE_STRINGS[name])
        ).otherwise(type_str)

    return src.select(
        toid(F.col("ledger_sequence"), F.col("tx_index"), 0).alias("transaction_id"),
        F.col("transaction_hash"),
        F.col("ledger_sequence"),
        F.col("closed_at"),
        F.col("contract_id"),
        type_int.alias("type"),
        type_str.alias("type_string"),
        F.col("in_successful_contract_call"),
        F.col("tx_successful").alias("successful"),
        F.col("topics"),
        F.col("topics_decoded"),
        F.col("data"),
        F.col("data_decoded"),
        F.col("contract_event_xdr"),
    )
