"""token_transfers ledger (reference: internal/transform/token_transfer.go:
14-151): classify SAC events into transfer/mint/burn/clawback/fee rows
(the reference delegates to stellar/go's EventsProcessor; its output switch,
lines 47-76, is the spec we re-derive)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.scalars import stroops_to_real
from stellar_etl_spark.functions.toid import toid

EVENT_KINDS = ("transfer", "mint", "burn", "clawback", "fee")


def canonical_asset_parts(
    asset: Column,
) -> tuple[Column, Column, Column, Column]:
    """(asset_concat, asset_type, code, issuer) from an event asset string.

    Canonical asset split (getAssetFromEvent, token_transfer.go:132-151):
    classic-derived events carry the reference's THREE-part
    "TYPE:CODE:ISSUER" concat, Soroban-decoded SAC events the two-part
    SEP-41 "CODE:ISSUER" — accept both, emit the three-part form with the
    type recomputed from the code length ('native' passes through)."""
    is_native = asset == "native"
    parts = F.split(asset, ":")
    code = F.when(
        ~is_native,
        F.when(F.size(parts) == 3, parts[1]).otherwise(parts[0]),
    )
    issuer = F.when(
        ~is_native,
        F.when(F.size(parts) == 3, parts[2]).otherwise(parts[1]),
    )
    asset_type = F.when(is_native, F.lit("native")).otherwise(
        F.when(F.length(code) <= 4, F.lit("credit_alphanum4")).otherwise(
            F.lit("credit_alphanum12")
        )
    )
    asset_concat = F.when(is_native, F.lit("native")).otherwise(
        F.concat_ws(":", asset_type, code, issuer)
    )
    return asset_concat, asset_type, code, issuer


def transform_token_transfer(events: DataFrame) -> DataFrame:
    """One row per SAC token movement from successful contract calls.

    Classification switch (token_transfer.go:47-76):
      - transfer: from & to present
      - mint: no from (tokens appear at ``to``)
      - burn: no to (tokens vanish from ``from``)
      - clawback: admin removes from ``from``
      - fee: ``from`` pays the network
    Amounts are stroops × 1e-7 (lines 52-73).

    Fee events always count — the network charges fees on FAILED
    transactions too (the reference EventsProcessor emits FeeEvents
    unconditionally); op events count only when the transaction AND the
    contract invocation succeeded.  The classic-derived stream stamps fee
    rows successful, so the gate is a no-op there; the Soroban-decoded
    stream carries the real flags and must keep failed-tx fee debits —
    the same gate ``verify_token_transfers`` applies.
    """
    src = events.where(
        F.col("sac_kind").isin(*EVENT_KINDS)
        & (
            (F.col("sac_kind") == "fee")
            | (
                F.col("tx_successful")
                & F.col("in_successful_contract_call")
            )
        )
    )
    asset_concat, asset_type, code, issuer = canonical_asset_parts(
        F.col("sac_asset")
    )
    return src.select(
        toid(F.col("ledger_sequence"), F.col("tx_index"), 0).alias("transaction_id"),
        # fee events are tx-level: no operation id (golden operation_id null)
        F.when(
            F.col("sac_kind") != "fee",
            toid(
                F.col("ledger_sequence"),
                F.col("tx_index"),
                F.coalesce(F.col("sac_op_index"), F.lit(0)) + 1,
            ),
        ).alias("operation_id"),
        F.col("transaction_hash"),
        F.col("ledger_sequence"),
        F.col("closed_at"),
        F.col("contract_id"),
        F.col("sac_kind").alias("event_type"),
        F.col("sac_kind").alias("event_topic"),
        asset_concat.alias("asset"),
        asset_type.alias("asset_type"),
        code.alias("asset_code"),
        issuer.alias("asset_issuer"),
        F.when(F.col("sac_kind") != "mint", F.col("sac_from")).alias("from"),
        F.when(F.col("sac_kind").isin("transfer", "mint"), F.col("sac_to")).alias("to"),
        F.when(
            F.col("sac_kind").isin("transfer", "mint"), F.col("sac_to_muxed")
        ).alias("to_muxed"),
        F.when(
            F.col("sac_kind").isin("transfer", "mint"), F.col("sac_to_muxed_id")
        ).alias("to_muxed_id"),
        F.col("sac_amount").cast("string").alias("amount_raw"),
        stroops_to_real(F.col("sac_amount")).alias("amount"),
    )
