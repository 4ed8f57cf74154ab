"""Build a HOSTILE twin of an sf directory: the original rows plus
adversarial rows with NULL/degenerate attributes (keys stay non-null).

Round-7 robustness program: sweeping all 240 registry queries against this
corpus found 13 hard crashes (ANSI divide-by-zero on empty shingle sets,
array-index on NULL-fused group keys, Python kernels on None payloads, a
descending sequence() emitting phantom frames) and ~18 cross-engine NULL/
unicode semantic divergences — all fixed or contracted explicitly.  Round 8
removed the last ASCII predicates: the media fingerprints hash the
uppercase-hex rendering of the bytes, so the oracles are byte-exact via
hex(encode(text)) on any unicode corpus.  The
differential gate is `python tools/check_correctness.py <hostile_dir>`:
240/240 as of round 7.  Round 9 added the degenerate-embedding shapes the
codegen predicate must agree on (all-NULL-element, empty), DIMENSION-
mismatched vectors (excluded by the size-64 half of the valid-vector
contract — unfiltered they hard-crash the PQ kernels), and MALFORMED JSON
props (Spark json functions yield NULL where DuckDB's hard-error; the
shared contract is NULL extraction via try_parse_json / json_valid).

Usage: python tools/make_hostile.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys


def build(sf_dir: str, out_dir: str) -> str:
    import duckdb

    marker = os.path.join(out_dir, "_HOSTILE_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{os.path.join(sf_dir, t)}.parquet') "
            f"TO '{os.path.join(out_dir, t)}.parquet' (FORMAT PARQUET)"
        )
    # Hostile EMBEDDING rows (round-8): a zero vector (no cosine direction —
    # divides by zero under ANSI without the valid-vector contract), a NULL
    # embedding (crashes numpy kernels), and a NULL label.  Both engine
    # sides exclude NULL/all-zero vectors (queries.emb_table / the
    # shadowing CTE in the oracles).
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'embeddings')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (990001, [CAST(0.0 AS FLOAT) FOR i IN range(64)], 3),
    (990002, NULL, 4),
    (990003, [CAST(0.1 AS FLOAT) FOR i IN range(64)], NULL),
    -- round-9: the codegen-friendly array_min/array_max filter must agree
    -- with DuckDB's list_filter on the degenerate shapes where a naive
    -- null-safe-equality rewrite would diverge: an all-NULL-element
    -- vector and an empty vector (both excluded on both sides)
    (990004, [CAST(NULL AS FLOAT) FOR i IN range(64)], 5),
    (990005, CAST([] AS FLOAT[]), 6),
    -- round-9b: DIMENSION-mismatched vectors (ingestion bug / wrong
    -- model) — nonzero, so only the len(embedding)=64 contract excludes
    -- them; unfiltered they feed ragged sub-vectors into the PQ/IVF
    -- numpy kernels and truncated dot products into the HOF scorers
    (990006, [CAST(0.5 AS FLOAT) FOR i IN range(10)], 7),
    (990007, [CAST(0.25 AS FLOAT) FOR i IN range(100)], 8)
  ) v(vec_id, embedding, label)
) TO '{os.path.join(out_dir, 'embeddings')}.parquet' (FORMAT PARQUET)"""
    )
    # Hostile DIMENSION rows (round-8b): non-null keys, NULL/degenerate
    # attributes, plus keys no fact row references (dangling dims) and a
    # c_nationkey no nation has (dangling FK) — stressing join vs GROUP BY
    # NULL semantics and aggregate NULL-skipping on both engines.
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'customer')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (910000, NULL, 0, NULL, NULL),
    (910001, 'Hostile Cust', NULL, -999.99, ''),
    (910002, '', 98, 0.0, 'BUILDING')
  ) v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
) TO '{os.path.join(out_dir, 'customer')}.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'supplier')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (920000, NULL, NULL, NULL),
    (920001, '', 0, -1.5)
  ) v(s_suppkey, s_name, s_nationkey, s_acctbal)
) TO '{os.path.join(out_dir, 'supplier')}.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'part')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (930000, NULL, NULL, NULL, NULL, NULL),
    (930001, '', 'Brand#00', '', 0, 0.0)
  ) v(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
) TO '{os.path.join(out_dir, 'part')}.parquet' (FORMAT PARQUET)"""
    )
    # Hostile SILVER rows (round-8): orders/lineitem drive the derived
    # stellar-entity inputs (transforms/derive.py), so adversarial rows here
    # stress the 21 entity transforms AND their DuckDB twins end to end:
    #   - orderkeys 200000-200003 have NO lineitem rows → 0-op transactions
    #     on previously-empty ledgers (empty change sets for those seqs);
    #   - NULL o_custkey → NULL account_sequence; NULL/'' o_orderstatus →
    #     NULL/true successful flag through every result-code branch;
    #   - lineitem 200000/200001 rows carry NULL l_partkey (NULL asset
    #     struct), NULL l_suppkey (NULL accounts), NULL/0/negative/huge
    #     l_quantity (NULL / zero-amount / sign / magnitude stroops);
    #   - orderkey 300000 lineitems are ORPHAN ops (no parent order).
    # Values stay inside the engines' shared decimal envelopes (no
    # DECIMAL(12,2) overflow) so ANSI mode and DuckDB agree.
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'orders')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (200000, NULL, 'O', 1234.56, TIMESTAMP '2024-02-01', '1-URGENT'),
    (200001, 7, NULL, NULL, NULL, NULL),
    (200002, 7, '', 0.0, TIMESTAMP '2024-02-02', NULL),
    (200003, NULL, NULL, NULL, NULL, NULL),
    -- a customer whose order total SUM is negative (refund-heavy account):
    -- signed cents averages must round half away from zero on both engines
    (200004, 910001, 'O', -4444.445, TIMESTAMP '2024-02-06', '2-HIGH')
  ) v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
      o_orderpriority)
) TO '{os.path.join(out_dir, 'orders')}.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'lineitem')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (200000, NULL, 55, 1, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
    (200000, 3, NULL, 2, 0.0, 0.0, 0.0, 0.0, 'N', 'O',
     TIMESTAMP '2024-02-03'),
    (200001, 4, 5, 1, -5.0, -100.0, 0.1, 0.02, 'R', 'F',
     TIMESTAMP '2024-02-04'),
    (200001, 5, 6, 2, 9999999.99, 9999999.99, 0.0, 0.0, 'A', 'F', NULL),
    (300000, 6, 7, 1, 1.0, 10.0, 0.0, 0.0, 'N', 'O',
     TIMESTAMP '2024-02-05')
  ) v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      l_shipdate)
) TO '{os.path.join(out_dir, 'lineitem')}.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'documents')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (900001, NULL, NULL, NULL, NULL),
    (900002, '', 'en', 'web', 0),
    (900003, 'one', 'en', 'web', 3),
    (900004, 'émoji 🎉 ünïcode tëxt wörds ünïcode tëxt wörds ünïcode tëxt',
     'de', 'web', 59),
    (900005, '   ', 'en', 'web', 3),
    (900006, repeat('x ', 500), NULL, 'book', 1000)
  ) v(doc_id, text, lang, source, n_chars)
) TO '{os.path.join(out_dir, 'documents')}.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
  SELECT * FROM '{os.path.join(sf_dir, 'events')}.parquet'
  UNION ALL SELECT * FROM (VALUES
    (9900001, TIMESTAMP '2024-03-01 00:00:00', NULL, NULL, NULL, NULL),
    (9900002, TIMESTAMP '2024-03-01 00:00:01', 42, 'purchase', NULL, '{{}}'),
    (9900003, TIMESTAMP '2024-03-01 00:00:02', 42, NULL, 1.5, NULL),
    -- round-8 silver hostiles: an isolated far ledger for the derived
    -- soroban/state changes (eid//500+2) and a value at the top of the
    -- shared DECIMAL(10,4) envelope (larger would overflow BOTH engines'
    -- tightest oracle cast, which is its own contract)
    (9900004, TIMESTAMP '2024-03-01 00:00:03', 314, 'purchase', 99999.1234,
     '{{"k":"v"}}'),
    (9900005, TIMESTAMP '2024-03-01 00:00:04', 0, 'view', -99999.9999, '[]'),
    -- a NEW event_type whose group sum is NEGATIVE: flushes out signed
    -- floor-division rounding in any per-type cents average (the
    -- incremental_agg_merge 1-ulp class) — round-half must go AWAY from
    -- zero on both engines
    (9900006, TIMESTAMP '2024-03-01 00:00:05', 7, 'refund', -11111.1115,
     '{{}}'),
    (9900007, TIMESTAMP '2024-03-01 00:00:06', 7, 'refund', -22222.2225,
     NULL),
    (9900008, TIMESTAMP '2024-03-01 00:00:07', 8, 'refund', 3.0, '{{}}'),
    -- extreme event times: pre-1970 (NEGATIVE epoch — integer '//'
    -- truncates toward zero on both engines but Spark's window() FLOORS,
    -- which caught sliding_windows_15min) and far-future within the ns
    -- domain
    (9920001, TIMESTAMP '1969-12-25 06:30:00', 21, 'view', 1.5, '{{}}'),
    (9920002, TIMESTAMP '1969-12-31 23:59:59.999999', 21, 'purchase', 2.5,
     '{{}}'),
    (9920003, TIMESTAMP '2200-01-01 00:00:00', 22, 'view', 3.5, '{{}}'),
    -- round-9b: MALFORMED JSON props — Spark's get_json_object /
    -- try_parse_json yield NULL where DuckDB's json functions hard-error;
    -- the shared contract is NULL extraction (json_valid guard in the
    -- oracles), plus a valid-scalar and a truncated-object blob
    (9930001, TIMESTAMP '2024-03-02 00:00:00', 30, 'view', 1.0, '{{'),
    (9930002, TIMESTAMP '2024-03-02 00:00:01', 30, 'view', 2.0, 'not json'),
    (9930003, TIMESTAMP '2024-03-02 00:00:02', 30, 'purchase', 3.0,
     '{{"k":'),
    (9930004, TIMESTAMP '2024-03-02 00:00:03', 30, 'purchase', 4.0, '123'),
    (9930005, TIMESTAMP '2024-03-02 00:00:04', 30, 'view', 5.0,
     '{{"k": "7"}}'),
    -- round-9c: NON-FINITE measures — NaN/±Inf value hard-errored 22
    -- DuckDB oracles (DECIMAL/BIGINT casts) and long-overflowed one Spark
    -- path while Spark's ANSI decimal cast silently NULLed; the shared
    -- FINITE-VALUE contract (catalog.table normalization + the
    -- FROM-events isfinite rewrite in oracles.py) treats them as NULL.
    -- SCOPE: the contract covers the MEASURE column (events.value) only.
    -- TPC-H money columns (l_extendedprice etc.) stay under the round-8
    -- decimal-envelope contract — non-finite there fails the DIFFERENTIAL
    -- GATE loudly (oracle error) rather than paying the scan-level
    -- normalization that would strip their predicate pushdown
    -- (tpch_q6's l_discount/l_quantity row-group skipping, a real 100 TB
    -- asset the plan pins protect)
    (9950001, TIMESTAMP '2024-03-03 00:00:00', 40, 'view',
     'nan'::DOUBLE, '{{}}'),
    (9950002, TIMESTAMP '2024-03-03 00:00:01', 40, 'purchase',
     'inf'::DOUBLE, '{{}}'),
    (9950003, TIMESTAMP '2024-03-03 00:00:02', 41, 'view',
     '-inf'::DOUBLE, '{{}}')
  ) v(event_id, ts, user_id, event_type, value, props)
) TO '{os.path.join(out_dir, 'events')}.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    with open(marker, "w") as f:
        f.write(f"source={sf_dir}\n")
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_hostile"
    print(build(sf, out))
