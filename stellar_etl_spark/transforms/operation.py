"""history_operations projection (reference: internal/transform/operation.go:
30-101 and the 27-case details switch, operation.go:584-1173).

The details map becomes a sparse typed struct (prunable) plus a compact
``details_json`` twin (the parquet converter's JSON form,
parquet_converter.go:19-25).  Per-type logic is a ``when`` chain over the
co-indexed body struct — all JVM expressions, one narrow projection.
Sponsor resolution scans the op's own change array (operation.go:296-358) via
``filter`` + ``element_at`` — correlation without a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.hashes import asset_id
from stellar_etl_spark.functions.scalars import price_to_float, stroops_to_real
from stellar_etl_spark.functions.toid import toid
from stellar_etl_spark.schemas import OPERATION_TYPE_NAMES


def op_type_string(type_col: Column) -> Column:
    """Type int → canonical name (operation.go:103-166)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in OPERATION_TYPE_NAMES.items() for x in kv]
    )
    return mapping[type_col]


def _asset_cols(asset: Column, prefix: str) -> list[Column]:
    """Flatten an asset struct into code/issuer/type/id columns, the way the
    reference's details maps spell them (operation.go:360-407)."""
    is_native = asset["asset_type"] == "native"
    return [
        F.when(~is_native, asset["asset_code"]).alias(f"{prefix}_asset_code"),
        F.when(~is_native, asset["asset_issuer"]).alias(f"{prefix}_asset_issuer"),
        asset["asset_type"].alias(f"{prefix}_asset_type"),
        F.when(
            asset["asset_type"].isNotNull(),
            asset_id(
                F.coalesce(asset["asset_code"], F.lit("")),
                F.coalesce(asset["asset_issuer"], F.lit("")),
                asset["asset_type"],
            ),
        ).alias(f"{prefix}_asset_id"),
    ]


# Account/trustline authorization flags (operation.go:555-582, 2024-2078).
FLAG_NAMES = {
    1: "auth_required",
    2: "auth_revocable",
    4: "auth_immutable",
    8: "auth_clawback_enabled",
}


def flag_strings(flags_col: Column) -> Column:
    """int flag array → canonical flag-name array (order by bit value)."""
    mapping = F.create_map(*[F.lit(x) for kv in FLAG_NAMES.items() for x in kv])
    return F.transform(F.array_sort(flags_col), lambda f: mapping[f])


def transform_operation(operations: DataFrame, transactions: DataFrame) -> DataFrame:
    """One output row per operation.

    - operation id = TOID(ledger, tx, op_index+1) — the +1 offset is the
      reference's (operation.go:32)
    - source account defaults to the tx source when the op has none
      (operation.go:287-294)
    - sponsor = sponsor of the last change whose post carries one
      (operation.go:296-358 change scan)
    """
    tx_src = transactions.select(
        F.col("ledger_sequence").alias("_ls"),
        F.col("tx_index").alias("_ti"),
        F.col("source_account").alias("_tx_source"),
        F.col("transaction_hash").alias("_tx_hash"),
    )

    ops = operations.join(
        tx_src,
        (operations.ledger_sequence == tx_src._ls)
        & (operations.tx_index == tx_src._ti),
        "left",
    )

    body = F.col("body")
    sponsoring = F.filter(
        F.col("changes"), lambda c: c["post"]["sponsor"].isNotNull()
    )
    sponsor = F.try_element_at(sponsoring, F.lit(-1))["post"]["sponsor"]

    details = F.struct(
        body["from"].alias("from"),
        body["to"].alias("to"),
        F.when(body["amount"].isNotNull(), stroops_to_real(body["amount"])).alias(
            "amount"
        ),
        *_asset_cols(body["asset"], "asset"),
        F.when(
            body["starting_balance"].isNotNull(),
            stroops_to_real(body["starting_balance"]),
        ).alias("starting_balance"),
        body["account"].alias("account"),
        body["offer_id"].alias("offer_id"),
        *_asset_cols(body["selling"], "selling"),
        *_asset_cols(body["buying"], "buying"),
        F.when(
            body["price_n"].isNotNull(),
            price_to_float(body["price_n"], body["price_d"]),
        ).alias("price"),
        F.when(
            body["price_n"].isNotNull(),
            F.struct(body["price_n"].alias("n"), body["price_d"].alias("d")),
        ).alias("price_r"),
        *_asset_cols(body["send_asset"], "source"),
        F.when(body["send_max"].isNotNull(), stroops_to_real(body["send_max"])).alias(
            "source_max"
        ),
        F.when(
            body["dest_amount"].isNotNull(), stroops_to_real(body["dest_amount"])
        ).alias("destination_amount"),
        body["trustor"].alias("trustor"),
        body["authorize"].alias("authorize"),
        F.when(body["limit"].isNotNull(), stroops_to_real(body["limit"])).alias(
            "limit"
        ),
        body["set_flags"].alias("set_flags"),
        F.when(
            body["set_flags"].isNotNull(), flag_strings(body["set_flags"])
        ).alias("set_flags_s"),
        body["clear_flags"].alias("clear_flags"),
        F.when(
            body["clear_flags"].isNotNull(), flag_strings(body["clear_flags"])
        ).alias("clear_flags_s"),
        body["master_weight"].alias("master_key_weight"),
        body["low_threshold"].alias("low_threshold"),
        body["med_threshold"].alias("med_threshold"),
        body["high_threshold"].alias("high_threshold"),
        body["home_domain"].alias("home_domain"),
        body["signer_key"].alias("signer_key"),
        body["signer_weight"].alias("signer_weight"),
        body["data_name"].alias("data_name"),
        body["data_value"].alias("data_value"),
        body["bump_to"].cast("string").alias("bump_to"),
        body["balance_id"].alias("balance_id"),
        body["claimants"].alias("claimants"),
        body["sponsored_id"].alias("sponsored_id"),
        body["pool_id"].alias("liquidity_pool_id"),
        body["shares"].alias("shares"),
        body["fn_type"].alias("function"),
        body["contract_id"].alias("contract_id"),
        # host-fn args ride as serialized ScVal strings (operation.go:2247-2273)
        body["args"].alias("parameters"),
        body["extend_to"].alias("extend_to"),
    )

    return ops.select(
        toid(F.col("ledger_sequence"), F.col("tx_index"), F.col("op_index") + 1).alias(
            "id"
        ),
        toid(F.col("ledger_sequence"), F.col("tx_index"), 0).alias("transaction_id"),
        F.col("_tx_hash").alias("transaction_hash"),
        F.col("ledger_sequence"),
        (F.col("op_index") + 1).alias("application_order"),
        F.coalesce(F.col("source_account"), F.col("_tx_source")).alias(
            "source_account"
        ),
        F.col("source_muxed").alias("source_account_muxed"),
        F.col("type"),
        op_type_string(F.col("type")).alias("type_string"),
        F.col("tx_successful").alias("transaction_successful"),
        F.col("result_code"),
        F.col("trace_code"),
        sponsor.alias("sponsor"),
        details.alias("details"),
        F.to_json(details, {"ignoreNullFields": "true"}).alias("details_json"),
    )
