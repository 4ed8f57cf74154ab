"""Build a key-shifted 10× scale-probe replica of an sf directory.

Facts (lineitem, orders, events, documents, embeddings) are replicated 10×
with their primary/foreign keys shifted by ``r * SHIFT`` per replica r, so
join cardinalities and group counts scale honestly; dimensions (region,
nation, customer, supplier, part) are copied as-is — the deployment shape
where facts grow and dims don't.

Document texts get a per-replica salt token appended (replica 0 keeps the
original bytes), so the probe measures how near-dup PLANS scale with corpus
size rather than flooding the answer set with 10-way exact replicas — the
round-3 probe replicated texts verbatim and its near-dup outputs grew
quadratically by construction, drowning the plan signal (SCALE.md).

Usage: python tools/make_scale_probe.py [sf_dir] [out_dir] [factor]
Writes a _PROBE_OK marker; re-runs are no-ops when the marker exists.
"""

from __future__ import annotations

import os
import sys

SHIFT = 1_000_000_000


def build(sf_dir: str, out_dir: str, factor: int = 10) -> str:
    import duckdb

    marker = os.path.join(out_dir, "_PROBE_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"'{os.path.join(sf_dir, t)}.parquet'"

    def copy(select: str, t: str) -> None:
        con.sql(
            f"COPY ({select}) TO '{os.path.join(out_dir, t)}.parquet' "
            "(FORMAT PARQUET)"
        )

    rep = f"range({factor}) t(r)"
    for t in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {src(t)}", t)
    copy(
        f"SELECT d.* REPLACE (l_orderkey + r * {SHIFT} AS l_orderkey) "
        f"FROM {src('lineitem')} d, {rep}",
        "lineitem",
    )
    copy(
        f"SELECT d.* REPLACE (o_orderkey + r * {SHIFT} AS o_orderkey) "
        f"FROM {src('orders')} d, {rep}",
        "orders",
    )
    copy(
        f"SELECT d.* REPLACE (event_id + r * {SHIFT} AS event_id, "
        f"user_id + r * {SHIFT} AS user_id) "
        f"FROM {src('events')} d, {rep}",
        "events",
    )
    copy(
        f"SELECT d.* REPLACE (doc_id + r * {SHIFT} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE text || ' r' || r END AS text, "
        "CASE WHEN r = 0 THEN n_chars "
        "ELSE length(text || ' r' || r) END AS n_chars) "
        f"FROM {src('documents')} d, {rep}",
        "documents",
    )
    # circular-rotate each replica's vector by r positions: same norm and
    # distribution, but replicas are no longer exact-duplicate vectors (10
    # identical copies per point would make every similarity/near-dup probe
    # output-quadratic by construction, hiding the plan signal).  The
    # rotation is modular in the vector length so factors above the
    # embedding dimension still produce valid vectors (rotations repeat
    # every dim replicas then — run similarity probes at factor <= dim).
    copy(
        f"SELECT d.* REPLACE (vec_id + r * {SHIFT} AS vec_id, "
        "list_concat(embedding[(r % len(embedding))+1:], "
        "embedding[1:(r % len(embedding))]) AS embedding) "
        f"FROM {src('embeddings')} d, {rep}",
        "embeddings",
    )
    con.close()
    with open(marker, "w") as f:
        f.write(f"source={sf_dir} factor={factor}\n")
    return out_dir


def build_novel(sf_dir: str, out_dir: str, factor: int = 100) -> str:
    """NOVEL-content replica for the near-dup/similarity 100× probe
    (round-6 verdict item 3): suffix-salted replicas keep ~1.0 similarity
    to their originals, so a near-dup answer grows QUADRATICALLY with the
    factor and drowns the plan signal.  Here every token of replica r > 0
    is prefixed ``r{r}_`` — replica shingle spaces are pairwise DISJOINT,
    so each replica reproduces the original corpus's internal near-dup
    structure and the true answer scales linearly with the factor.
    Embeddings compose a circular rotation (r % dim) with a parity sign
    flip keyed by r // dim: norms are preserved, transforms are distinct
    past factor = dim, and cross-replica cosine stays low.  Keys shift as
    in :func:`build`; non-document tables are built identically."""
    import duckdb

    marker = os.path.join(out_dir, "_PROBE_NOVEL_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"'{os.path.join(sf_dir, t)}.parquet'"

    def copy(select: str, t: str) -> None:
        con.sql(
            f"COPY ({select}) TO '{os.path.join(out_dir, t)}.parquet' "
            "(FORMAT PARQUET)"
        )

    rep = f"range({factor}) t(r)"
    for t in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {src(t)}", t)
    copy(
        f"SELECT d.* REPLACE (l_orderkey + r * {SHIFT} AS l_orderkey) "
        f"FROM {src('lineitem')} d, {rep}",
        "lineitem",
    )
    copy(
        f"SELECT d.* REPLACE (o_orderkey + r * {SHIFT} AS o_orderkey) "
        f"FROM {src('orders')} d, {rep}",
        "orders",
    )
    copy(
        f"SELECT d.* REPLACE (event_id + r * {SHIFT} AS event_id, "
        f"user_id + r * {SHIFT} AS user_id) "
        f"FROM {src('events')} d, {rep}",
        "events",
    )
    novel_text = (
        "CASE WHEN r = 0 THEN text ELSE "
        "concat('r', r, '_', replace(text, ' ', concat(' r', r, '_'))) END"
    )
    copy(
        f"SELECT d.* REPLACE (doc_id + r * {SHIFT} AS doc_id, "
        f"{novel_text} AS text, "
        f"length({novel_text}) AS n_chars) "
        f"FROM {src('documents')} d, {rep}",
        "documents",
    )
    rotated = (
        "list_concat(embedding[(r % len(embedding))+1:], "
        "embedding[1:(r % len(embedding))])"
    )
    copy(
        f"SELECT d.* REPLACE (vec_id + r * {SHIFT} AS vec_id, "
        f"CASE WHEN (r // len(embedding)) % 2 = 0 THEN {rotated} "
        f"ELSE list_transform({rotated}, x -> -x) END AS embedding) "
        f"FROM {src('embeddings')} d, {rep}",
        "embeddings",
    )
    con.close()
    with open(marker, "w") as f:
        f.write(f"source={sf_dir} factor={factor} novel=1\n")
    return out_dir


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_probe_10x"
    fac = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(build(sf, out, fac))
