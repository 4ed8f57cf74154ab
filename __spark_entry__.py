"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join; ``queries()`` exposes the full
operator registry (stellar_etl_spark.queries); ``oracle_sql()`` the DuckDB
twins (stellar_etl_spark.oracles).  See SURVEY.md §2 for the inventory map.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stellar_etl_spark.oracles import ORACLES
from stellar_etl_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: region revenue star join."""
    return QUERIES["tpch_q5_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
