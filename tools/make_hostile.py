"""Build a HOSTILE twin of an sf directory: the original rows plus
adversarial rows with NULL/degenerate attributes (keys stay non-null).

Round-7 robustness program: sweeping all 240 registry queries against this
corpus found 13 hard crashes (ANSI divide-by-zero on empty shingle sets,
array-index on NULL-fused group keys, Python kernels on None payloads, a
descending sequence() emitting phantom frames) and ~18 cross-engine NULL/
unicode semantic divergences — all fixed or contracted explicitly (the
byte-level media oracles carry an ASCII predicate on BOTH sides).  The
differential gate is `python tools/check_correctness.py <hostile_dir>`:
240/240 as of round 7.

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
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "embeddings",
    ):
        con.sql(
            f"COPY (SELECT * FROM '{os.path.join(sf_dir, t)}.parquet') "
            f"TO '{os.path.join(out_dir, t)}.parquet' (FORMAT PARQUET)"
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
    (9900003, TIMESTAMP '2024-03-01 00:00:02', 42, NULL, 1.5, NULL)
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
