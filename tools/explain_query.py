"""Print the formatted physical plan (and optionally the DuckDB oracle) of
any registry query — the inspection loop behind PLANS.md.

Usage:
    python tools/explain_query.py <query_name> [sf_dir]
    python tools/explain_query.py <query_name> --sql   # show oracle too
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_sql = "--sql" in sys.argv
    if not args:
        from stellar_etl_spark.queries import QUERIES

        print("\n".join(sorted(QUERIES)))
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from stellar_etl_spark.oracles import ORACLES
    from stellar_etl_spark.queries import QUERIES
    from stellar_etl_spark.session import get_spark

    if name not in QUERIES:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    spark = get_spark("explain", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    df.explain("formatted")
    if show_sql:
        print("\n-- DuckDB oracle --------------------------------------")
        print(ORACLES.get(name, "(no oracle: rows-only weak check)"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
