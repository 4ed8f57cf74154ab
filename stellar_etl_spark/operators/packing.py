"""Sequence packing for training-data pipelines.

Packing concatenates documents into fixed-token-budget training sequences.
The bin assignment is a *sequential* greedy fold over an ordered document
stream — not expressible as window/cumsum column algebra (a bin closes only
when the next document would overflow it, so the running fill resets
data-dependently).  This is exactly the shape ``applyInPandas`` exists for:
the fold runs per shard (e.g. per source), shards run in parallel, and no
state ever leaves an executor.

Scale shape: one shuffle to co-locate each shard, then an O(docs-in-shard)
Arrow-batched fold.  At 100 TB the shard key is whatever unit must be packed
contiguously (source, domain, date bucket…); shards are independent, so skew
is handled by sub-sharding the key upstream, not by the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_next_fit(
    df: DataFrame,
    group_col: str = "source",
    order_col: str = "doc_id",
    size_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Greedy next-fit packing: walk the shard in ``order_col`` order, keep
    appending documents to the current bin, open a new bin when the next
    document would overflow ``budget``.  A document larger than the budget
    occupies a (oversized) bin alone.  The first document always lands in
    bin 0.

    Deterministic given the ordering column, so it is oracle-checkable (the
    DuckDB twin is a recursive CTE stepping the same fold).
    """

    out_schema = (
        f"{group_col} string, {order_col} bigint, {size_col} bigint, bin_id bigint"
    )

    def fold(pdf):
        pdf = pdf.sort_values(order_col, ignore_index=True)
        bins = []
        fill = 0
        bin_id = 0
        first = True
        for t in pdf[size_col]:
            t = int(t)
            if not first and fill + t > budget:
                bin_id += 1
                fill = t
            else:
                fill += t
            first = False
            bins.append(bin_id)
        pdf["bin_id"] = bins
        return pdf[[group_col, order_col, size_col, "bin_id"]]

    src = df.select(
        F.col(group_col),
        F.col(order_col).cast("long").alias(order_col),
        F.col(size_col).cast("long").alias(size_col),
    )
    return src.groupBy(group_col).applyInPandas(fold, out_schema)


def pack_stats(packed: DataFrame, group_col: str = "source", budget: int = 512) -> DataFrame:
    """Per-shard packing efficiency: bins used, mean fill fraction."""
    per_bin = packed.groupBy(group_col, "bin_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    return per_bin.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.round(
            F.sum("fill").cast("double") / (F.count(F.lit(1)) * budget), 6
        ).alias("mean_fill_frac"),
    )
