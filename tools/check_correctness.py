"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and (column-name-sorted, row-sorted) values — stricter than the driver's
value hash: exact equality, with near-miss diagnostics for floats.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def _dtype_split(sv: pd.Series, ov: pd.Series) -> str | None:
    """Representation mismatch that the driver's format-sensitive value hash
    would flag even when every value is numerically identical.

    Round 4 lesson: DuckDB types SUM(<integer>) as HUGEINT, which pandas
    renders as float64 while Spark returns int64 — ``123`` vs ``123.0`` hash
    differently.  Fail on int-vs-float splits; also fail on integer-width
    splits (int32 vs int64) as cheap insurance against a driver hash that
    includes dtype.  Bool-vs-bool and float32-vs-float64 are left to the
    value comparison (Spark floats round-trip as float64 via toPandas).
    """
    s_int = pd.api.types.is_integer_dtype(sv)
    o_int = pd.api.types.is_integer_dtype(ov)
    s_flt = pd.api.types.is_float_dtype(sv)
    o_flt = pd.api.types.is_float_dtype(ov)
    if (s_int and o_flt) or (s_flt and o_int):
        return f"dtype split int-vs-float: spark={sv.dtype} oracle={ov.dtype}"
    if s_int and o_int and sv.dtype != ov.dtype:
        return f"dtype split int width: spark={sv.dtype} oracle={ov.dtype}"
    return None


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_df), normalize(oracle_df)
    for col in s.columns:
        sv, ov = s[col], o[col]
        split = _dtype_split(sv, ov)
        if split:
            problems.append(f"col {col}: {split}")
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            # -0.0 == 0.0 compares equal but renders differently ("-0.0"
            # vs "0.0"), which a format-sensitive value hash would flag
            sz = (a == 0) & (b == 0) & (np.signbit(a) != np.signbit(b))
            if sz.any():
                problems.append(
                    f"col {col}: {int(sz.sum())} signed-zero splits "
                    "(-0.0 vs 0.0)"
                )
            exact = (a == b) | (np.isnan(a) & np.isnan(b))
            if not exact.all():
                bad = int((~exact).sum())
                idx = int(np.argmax(~exact))
                close = np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
                problems.append(
                    f"col {col}: {bad} float diffs (close={close}) e.g. "
                    f"{a[idx]!r} vs {b[idx]!r}"
                )
        else:
            eq = (sv.astype(object).to_numpy() == ov.astype(object).to_numpy()) | (
                sv.isna().to_numpy() & ov.isna().to_numpy()
            )
            if not eq.all():
                bad = int((~eq).sum())
                idx = int(np.argmax(~eq))
                problems.append(
                    f"col {col}: {bad} value diffs e.g. "
                    f"{sv.iloc[idx]!r} ({sv.dtype}) vs {ov.iloc[idx]!r} ({ov.dtype})"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from stellar_etl_spark.session import get_spark

    spark = get_spark("check-correctness", cpus=int(os.environ.get("CHECK_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = e.queries(), e.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failed += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_pdf)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            failed += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      - {p}")
            failed += 1
        else:
            print(f"pass  {name}: rows={len(spark_pdf)} [{time.time()-t0:.1f}s]")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} weak (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
