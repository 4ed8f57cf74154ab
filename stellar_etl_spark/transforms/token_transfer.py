"""token_transfers ledger (reference: internal/transform/token_transfer.go:
14-151): classify SAC events into transfer/mint/burn/clawback/fee rows
(the reference delegates to stellar/go's EventsProcessor; its output switch,
lines 47-76, is the spec we re-derive)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.scalars import stroops_to_real
from stellar_etl_spark.functions.toid import toid

EVENT_KINDS = ("transfer", "mint", "burn", "clawback", "fee")


def transform_token_transfer(events: DataFrame) -> DataFrame:
    """One row per SAC token movement from successful contract calls.

    Classification switch (token_transfer.go:47-76):
      - transfer: from & to present
      - mint: no from (tokens appear at ``to``)
      - burn: no to (tokens vanish from ``from``)
      - clawback: admin removes from ``from``
      - fee: ``from`` pays the network
    Amounts are stroops × 1e-7 (lines 52-73).
    """
    src = events.where(
        F.col("sac_kind").isin(*EVENT_KINDS)
        & F.col("tx_successful")
        & F.col("in_successful_contract_call")
    )
    return src.select(
        toid(F.col("ledger_sequence"), F.col("tx_index"), 0).alias("transaction_id"),
        F.col("transaction_hash"),
        F.col("ledger_sequence"),
        F.col("contract_id"),
        F.col("sac_kind").alias("event_type"),
        F.col("sac_asset").alias("asset"),
        F.when(F.col("sac_kind") != "mint", F.col("sac_from")).alias("from"),
        F.when(F.col("sac_kind").isin("transfer", "mint"), F.col("sac_to")).alias("to"),
        F.col("sac_amount").cast("string").alias("amount_raw"),
        stroops_to_real(F.col("sac_amount")).alias("amount"),
    )
