"""ANSI-mode survivability: every registry query must run with
spark.sql.ansi.enabled=true (no overflowing casts, no invalid element_at /
malformed-input expressions). The driver may run with either setting."""

from __future__ import annotations

import pytest

from stellar_etl_spark.queries import QUERIES


@pytest.fixture(scope="module")
def ansi_spark(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_ansi(ansi_spark, sf_dir, name):
    assert QUERIES[name](ansi_spark, sf_dir).count() >= 0
