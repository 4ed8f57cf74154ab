"""Driver-contract smoke: every registered query runs at sf0.001, returns a
stable schema, and has a same-named oracle (or is a documented weak check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from stellar_etl_spark.oracles import ORACLES
from stellar_etl_spark.queries import QUERIES

# Queries intentionally without a SQL oracle (rows-only driver check).
WEAK_OK: set[str] = set()


def test_registry_oracle_alignment():
    assert set(ORACLES) - set(QUERIES) == set()
    assert set(QUERIES) - set(ORACLES) == WEAK_OK


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "n_name", "revenue", "n_items"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_no_collect_in_operator_paths():
    """Scale guard: operator/query modules must not materialize to the driver."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "stellar_etl_spark"
    for py in root.rglob("*.py"):
        text = py.read_text()
        assert ".collect()" not in text, f"driver-side collect in {py}"
        assert ".toPandas()" not in text, f"driver-side toPandas in {py}"
