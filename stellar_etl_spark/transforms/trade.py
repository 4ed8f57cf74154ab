"""history_trades fan-out (reference: internal/transform/trade.go:21-162).

Claim atoms explode 1→N per trade-capable op of a successful tx; the sell
price comes from the LAST change whose pre-state matches the sold offer —
the reference's reverse scan (trade.go:281-304) expressed as an array
``filter`` + ``element_at(-1)`` over the op's co-indexed change array: pure
struct-internal correlation, no join, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.hashes import asset_id
from stellar_etl_spark.functions.scalars import stroops_to_real
from stellar_etl_spark.functions.toid import encode_offer_id, toid
from stellar_etl_spark.schemas import TRADE_OP_TYPES


def _aid(asset):
    return asset_id(
        F.coalesce(asset["asset_code"], F.lit("")),
        F.coalesce(asset["asset_issuer"], F.lit("")),
        asset["asset_type"],
    )


def transform_trade(operations: DataFrame, ledgers: DataFrame) -> DataFrame:
    """One row per claim atom of trade-capable ops in successful txs.

    - gate: op type ∈ {2,3,4,12,13} and tx successful (input/trades.go:89-104,
      trade.go:27-29)
    - 0-sold AND 0-bought atoms are skipped (trade.go:69-72)
    - offer trades: seller price from last matching pre-change offer entry;
      LP trades: pool fee from the pre-change pool entry (trade.go:264-317)
    - synthetic buying offer id when the buyer had no resting offer: TOID-typed
      id with bit 62 set (trade.go:116-120, synt_offer_id.go:28-35)
    """
    hdr = ledgers.select(
        F.col("sequence").alias("_seq"), F.col("closed_at").alias("_closed_at")
    )

    tradable = operations.where(
        F.col("type").isin(*TRADE_OP_TYPES) & F.col("tx_successful")
    )

    exploded = (
        tradable.join(F.broadcast(hdr), tradable.ledger_sequence == hdr._seq)
        .select(
            "ledger_sequence",
            "tx_index",
            "op_index",
            "changes",
            F.col("_closed_at").alias("ledger_closed_at"),
            F.posexplode("claim_atoms").alias("order", "atom"),
        )
        .where(~((F.col("atom.amount_sold") == 0) & (F.col("atom.amount_bought") == 0)))
    )

    atom = F.col("atom")
    op_id = toid(F.col("ledger_sequence"), F.col("tx_index"), F.col("op_index") + 1)

    # trade.go:281-304 — reverse scan for the last change whose PRE offer
    # matches this atom's sold offer; its price is the true sell price.
    matching_pre = F.filter(
        F.col("changes"),
        lambda c: c["pre"]["offer_id"].isNotNull()
        & (c["pre"]["offer_id"] == atom["offer_id"]),
    )
    last_pre = F.try_element_at(matching_pre, F.lit(-1))["pre"]
    is_lp = atom["atom_type"] == "lp"

    # trade.go:306-317 — LP fee from the pool's pre-change entry.
    pool_pre = F.filter(
        F.col("changes"), lambda c: c["pre"]["pool_fee"].isNotNull()
    )
    pool_fee = F.try_element_at(pool_pre, F.lit(-1))["pre"]["pool_fee"]

    price_n = F.when(is_lp, atom["amount_bought"]).otherwise(last_pre["price_n"])
    price_d = F.when(is_lp, atom["amount_sold"]).otherwise(last_pre["price_d"])

    return exploded.select(
        op_id.alias("history_operation_id"),
        F.col("order"),
        F.col("ledger_closed_at"),
        F.when(~is_lp, atom["seller_id"]).alias("selling_account_address"),
        _aid(atom["asset_sold"]).alias("selling_asset_id"),
        stroops_to_real(atom["amount_sold"]).alias("selling_amount"),
        _aid(atom["asset_bought"]).alias("buying_asset_id"),
        stroops_to_real(atom["amount_bought"]).alias("buying_amount"),
        price_n.cast("long").alias("price_n"),
        price_d.cast("long").alias("price_d"),
        is_lp.alias("selling_liquidity_pool"),
        F.when(is_lp, atom["pool_id"]).alias("liquidity_pool_id"),
        F.when(is_lp, pool_fee).alias("liquidity_pool_fee"),
        F.when(~is_lp, atom["offer_id"]).alias("selling_offer_id"),
        # the buyer's "offer" is synthetic — a TOID-typed id (trade.go:116-120)
        encode_offer_id(op_id, toid_type=True).alias("buying_offer_id"),
    )
