"""SQL-function registration: expose the engine's bit-exact scalar library
to ``spark.sql`` users (the extension surface the reference reserves for
BigQuery-side JS UDFs — docs/backfill.md pattern — provided natively here).

All registered functions are Arrow-batched pandas UDFs; registration is
per-session and idempotent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession) -> None:
    """Register the scalar library under SQL names: ``fnv64a``,
    ``asset_id`` (FarmHash64 of code+issuer+type, asset.go:72-77),
    ``strkey_account``/``strkey_contract``/``strkey_pool`` (SEP-23)."""
    from stellar_etl_spark.functions.hashes import asset_id_udf, fnv64a_udf
    from stellar_etl_spark.functions.strkey import (
        strkey_account_udf,
        strkey_contract_udf,
        strkey_pool_udf,
    )

    spark.udf.register("fnv64a", fnv64a_udf)
    spark.udf.register("asset_id", asset_id_udf)
    spark.udf.register("strkey_account", strkey_account_udf)
    spark.udf.register("strkey_contract", strkey_contract_udf)
    spark.udf.register("strkey_pool", strkey_pool_udf)
