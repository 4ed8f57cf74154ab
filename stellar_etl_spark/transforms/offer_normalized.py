"""Orderbook star schema (reference: internal/transform/offer_normalized.go:
16-57): dim_markets / dim_offers / dim_accounts / fact_offer_events with
FNV-64a surrogate ids and hash-dedup (input/orderbooks.go:72-118).

Spark shape: one narrow projection computes all ids, then three
``dropDuplicates`` dim selects + one fact select — Catalyst shares the
common subtree; the dedups are hash aggregations on the id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stellar_etl_spark.functions.hashes import fnv64a_udf
from stellar_etl_spark.functions.scalars import price_to_float


def _asset_repr(asset: Column) -> Column:
    """"code:issuer" serialization; native is "native:" (offer_normalized.go:
    78-96)."""
    return F.when(asset["asset_type"] == "native", F.lit("native:")).otherwise(
        F.concat_ws(
            ":",
            F.coalesce(asset["asset_code"], F.lit("")),
            F.coalesce(asset["asset_issuer"], F.lit("")),
        )
    )


def transform_offer_normalized(offers: DataFrame) -> dict[str, DataFrame]:
    """offers = live offer entries (entry struct already extracted, e.g. the
    output of transforms.changes.transform_offer pre-projection inputs).

    Expects columns: seller_id, offer_id, selling struct, buying struct,
    amount, price_n, price_d, ledger_sequence.
    """
    price = price_to_float(F.col("price_n"), F.col("price_d"))
    # market id hashes the SORTED asset pair (offer_normalized.go:102-136)
    sell_repr = _asset_repr(F.col("selling"))
    buy_repr = _asset_repr(F.col("buying"))
    pair = F.when(
        sell_repr <= buy_repr, F.concat_ws("/", sell_repr, buy_repr)
    ).otherwise(F.concat_ws("/", buy_repr, sell_repr))

    base = offers.select(
        F.col("ledger_sequence"),
        F.col("seller_id"),
        F.col("offer_id"),
        F.col("amount"),
        F.col("price_n"),
        F.col("price_d"),
        price.alias("price"),
        sell_repr.alias("selling_repr"),
        buy_repr.alias("buying_repr"),
        fnv64a_udf(pair).alias("market_id"),
        # offer dim id over "{offer_id}/{amount}/{price}" (139-147)
        fnv64a_udf(
            F.format_string(
                "%d/%d/%.6f", F.col("offer_id"), F.col("amount"), price
            )
        ).alias("offer_dim_id"),
        # account dim id over the seller strkey (172-183)
        fnv64a_udf(F.col("seller_id")).alias("account_dim_id"),
    )

    dim_markets = base.select(
        F.col("market_id"),
        F.col("selling_repr").alias("base_asset"),
        F.col("buying_repr").alias("counter_asset"),
    ).dropDuplicates(["market_id"])

    dim_offers = base.select(
        F.col("offer_dim_id").alias("dim_offer_id"),
        F.col("offer_id").alias("horizon_id"),
        F.col("market_id"),
        F.col("amount"),
        F.col("price"),
    ).dropDuplicates(["dim_offer_id"])

    dim_accounts = base.select(
        F.col("account_dim_id").alias("account_id"),
        F.col("seller_id").alias("address"),
    ).dropDuplicates(["account_id"])

    fact_offer_events = base.select(
        F.col("ledger_sequence").alias("ledger_id"),
        F.col("offer_dim_id").alias("offer_instance_id"),
        F.col("market_id"),
        F.col("account_dim_id").alias("account_id"),
    )

    return {
        "dim_markets": dim_markets,
        "dim_offers": dim_offers,
        "dim_accounts": dim_accounts,
        "fact_offer_events": fact_offer_events,
    }
