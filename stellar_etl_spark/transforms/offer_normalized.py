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

from stellar_etl_spark.functions.hashes import fnv64a_offer_dim_udf, fnv64a_udf
from stellar_etl_spark.functions.scalars import price_to_float, stroops_to_real


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
    amount (raw stroops), price_n, price_d, ledger_sequence.

    Output columns mirror NormalizedOfferOutput (schema.go:310-348):
    - dim_markets: market_id + base/counter code+issuer split from the
      SORTED "code:issuer" pair (extractDimMarket, offer_normalized.go
      sorted assets → base = assets[0])
    - dim_offers: horizon_offer_id, dim_offer_id over the "%d/%f/%f"
      preimage of (offer id, REAL-unit amount, price) — extractDimOffer;
      formatted in the Python UDF because Go/C %f rounds the exact binary
      double while Java's format_string rounds the shortest decimal repr —
      maker_id, action 's' when the selling asset is the sorted base else
      'b', base_amount (real units), counter_amount = base*price, price
    - dim_accounts: FNV of the seller strkey + address
    - fact_offer_events: (ledger_id, offer_instance_id) only
    """
    price = price_to_float(F.col("price_n"), F.col("price_d"))
    real_amount = stroops_to_real(F.col("amount"))
    # market id hashes the SORTED asset pair (offer_normalized.go:102-136)
    sell_repr = _asset_repr(F.col("selling"))
    buy_repr = _asset_repr(F.col("buying"))
    base_repr = F.least(sell_repr, buy_repr)
    counter_repr = F.greatest(sell_repr, buy_repr)
    pair = F.concat_ws("/", base_repr, counter_repr)

    base = offers.select(
        F.col("ledger_sequence"),
        F.col("seller_id"),
        F.col("offer_id"),
        real_amount.alias("amount"),
        price.alias("price"),
        base_repr.alias("base_repr"),
        counter_repr.alias("counter_repr"),
        # action: 's' when the SELLING asset is the sorted base
        # (extractDimOffer)
        F.when(sell_repr == base_repr, F.lit("s"))
        .otherwise(F.lit("b"))
        .alias("action"),
        fnv64a_udf(pair).alias("market_id"),
        # offer dim id over "%d/%f/%f" of (id, real amount, price)
        # (extractDimOffer importantFields); formatted Python-side — Go/C
        # %f rounds the exact binary double, Java's format_string doesn't
        fnv64a_offer_dim_udf(
            F.col("offer_id"), real_amount, price
        ).alias("offer_dim_id"),
        # account dim id over the seller strkey (extractDimAccount)
        fnv64a_udf(F.col("seller_id")).alias("account_dim_id"),
    )

    dim_markets = base.select(
        F.col("market_id"),
        F.split(F.col("base_repr"), ":").getItem(0).alias("base_code"),
        F.split(F.col("base_repr"), ":").getItem(1).alias("base_issuer"),
        F.split(F.col("counter_repr"), ":").getItem(0).alias("counter_code"),
        F.split(F.col("counter_repr"), ":").getItem(1).alias("counter_issuer"),
    ).dropDuplicates(["market_id"])

    dim_offers = base.select(
        F.col("offer_id").alias("horizon_offer_id"),
        F.col("offer_dim_id").alias("dim_offer_id"),
        F.col("market_id"),
        F.col("account_dim_id").alias("maker_id"),
        F.col("action"),
        F.col("amount").alias("base_amount"),
        (F.col("amount") * F.col("price")).alias("counter_amount"),
        F.col("price"),
    ).dropDuplicates(["dim_offer_id"])

    dim_accounts = base.select(
        F.col("account_dim_id").alias("account_id"),
        F.col("seller_id").alias("address"),
    ).dropDuplicates(["account_id"])

    fact_offer_events = base.select(
        F.col("ledger_sequence").alias("ledger_id"),
        F.col("offer_dim_id").alias("offer_instance_id"),
    )

    return {
        "dim_markets": dim_markets,
        "dim_offers": dim_offers,
        "dim_accounts": dim_accounts,
        "fact_offer_events": fact_offer_events,
    }
