"""Robust (median/MAD) statistics at scale — exact medians WITHOUT a
per-group sorted buffer.

``F.percentile`` / ``F.median`` are exact but buffer every value of a group
in one aggregator: with a handful of giant groups (here: 5 event types over
the whole history) that is the classic OOM shape at 100 TB.  The operators
here get the identical exact answer from a *value-frequency table*:

1. quantize the measure to integer cents (exact decimal-domain round);
2. ``groupBy(group, cents)`` count — a partial-aggregating hash shuffle
   whose output is bounded by the number of DISTINCT cent values per group
   (the value domain, not the row count);
3. per-group cumulative counts over that tiny table (window bounded by the
   distinct-value count) pick the lower/upper middle order statistics;
4. median = (lo + hi) / 2 carried as the INTEGER ``2×median`` so every
   downstream comparison stays in exact arithmetic.

MAD repeats the same trick on ``|2·x − 2·median|`` (still integers), so the
whole median-absolute-deviation outlier pass is two bounded shuffles and
never materializes a sorted group.  Mirrors the z-score pass
(queries.value_outliers) with a breakdown-point-0.5 estimator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _median2_from_freq(freq: DataFrame, group_col: str, value_col: str, count_col: str) -> DataFrame:
    """Exact ``2×median`` per group from a (group, value, count) frequency
    table: cumulative counts locate the two middle order statistics; ties
    and odd/even sizes fall out of the ``(n+1) div 2`` / ``(n+2) div 2``
    positions.  The window is over the frequency table (distinct values),
    not the raw rows."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    cum = freq.withColumn("_cum", F.sum(count_col).over(w))
    totals = cum.groupBy(group_col).agg(F.sum(count_col).cast("long").alias("_n"))
    j = cum.join(totals, group_col)
    pos_lo = (F.col("_n") + 1) - (F.col("_n") + 1) % 2  # 2*((n+1) div 2)
    lo = F.min(
        F.when(F.col("_cum") * 2 >= pos_lo, F.col(value_col))
    )
    pos_hi = (F.col("_n") + 2) - (F.col("_n") + 2) % 2  # 2*((n+2) div 2)
    hi = F.min(
        F.when(F.col("_cum") * 2 >= pos_hi, F.col(value_col))
    )
    return j.groupBy(group_col).agg(
        F.max("_n").alias("_n"), (lo + hi).alias("_median2")
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    cents: Column,
    cutoff: float = 4.4478,  # 3 × 1.4826 (normal-consistency constant)
) -> DataFrame:
    """Per-group robust outlier profile: exact median and MAD (as the
    integer ``2×median`` / ``4×MAD``), plus the count of rows whose absolute
    deviation exceeds ``cutoff × MAD``.  ``cents`` must be an integer-cents
    column expression (exact decimal quantization is the caller's contract).
    The only doubles are the final half/quarter-unit conversions — exact
    IEEE on both engines."""
    vals = df.select(F.col(group_col), cents.alias("_c"))
    # The ONLY pass over the raw rows: everything downstream (median, MAD,
    # outlier counts, extremes) is derivable from the (group, value, count)
    # frequency table, which is bounded by the distinct value domain.  The
    # lazy localCheckpoint truncates lineage so the two consumers (median
    # lookup, deviation re-bin) don't re-run the raw shuffle.
    freq = vals.groupBy(group_col, "_c").agg(
        F.count(F.lit(1)).alias("_f")
    ).localCheckpoint(eager=False)
    med = _median2_from_freq(freq, group_col, "_c", "_f")

    dev_freq = (
        freq.join(F.broadcast(med), group_col)
        .groupBy(
            F.col(group_col),
            F.abs(F.col("_c") * 2 - F.col("_median2")).alias("_d2"),
        )
        .agg(F.sum("_f").alias("_f"))
        .localCheckpoint(eager=False)
    )
    mad = _median2_from_freq(dev_freq, group_col, "_d2", "_f").select(
        F.col(group_col), F.col("_median2").alias("_mad4")
    )

    flagged = dev_freq.join(F.broadcast(mad), group_col).groupBy(group_col).agg(
        F.sum(
            F.when(
                F.col("_d2").cast("double") / 2.0
                > F.lit(cutoff) * (F.col("_mad4").cast("double") / 4.0),
                F.col("_f"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        F.max("_d2").cast("long").alias("max_abs_dev2"),
    )
    return (
        med.join(mad, group_col)
        .join(flagged, group_col)
        .select(
            F.col(group_col),
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_median2").cast("double") / 2.0).alias("median_cents"),
            (F.col("_mad4").cast("double") / 4.0).alias("mad_cents"),
            "n_outliers",
            "max_abs_dev2",
        )
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    cents: Column,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized profile: the exact ``lo_pct``/``hi_pct`` order
    statistics (lower-quantile convention — the value at position
    ``ceil(n·p/100)``, no interpolation) and the mean AFTER clamping into
    that band, plus how many rows each tail clamped.  Same scale discipline
    as ``mad_outlier_stats``: ONE pass over the raw rows builds the
    (group, cents, count) frequency table; quantile lookup, clamping, and
    the clamped sum all run over that bounded table, and the mean divides
    exactly in the DECIMAL domain (``exact_ratio_round6_wide``)."""
    from stellar_etl_spark.operators.util import exact_ratio_round6_wide

    vals = df.select(F.col(group_col), cents.alias("_c"))
    freq = vals.groupBy(group_col, "_c").agg(
        F.count(F.lit(1)).alias("_f")
    ).localCheckpoint(eager=False)

    w = Window.partitionBy(group_col).orderBy("_c")
    cum = freq.withColumn("_cum", F.sum("_f").over(w))
    totals = cum.groupBy(group_col).agg(F.sum("_f").cast("long").alias("_n"))
    j = cum.join(totals, group_col)
    pos_lo = F.expr(f"(_n * {lo_pct} + 99) div 100")  # ceil(n*p/100)
    pos_hi = F.expr(f"(_n * {hi_pct} + 99) div 100")
    q = j.groupBy(group_col).agg(
        F.max("_n").alias("_n"),
        F.min(F.when(F.col("_cum") >= F.greatest(pos_lo, F.lit(1)), F.col("_c"))).alias("_q_lo"),
        F.min(F.when(F.col("_cum") >= F.greatest(pos_hi, F.lit(1)), F.col("_c"))).alias("_q_hi"),
    )
    clamped = freq.join(F.broadcast(q), group_col).groupBy(group_col).agg(
        F.max("_n").cast("long").alias("n_rows"),
        F.max("_q_lo").cast("long").alias("q_lo_cents"),
        F.max("_q_hi").cast("long").alias("q_hi_cents"),
        F.sum(
            F.col("_f")
            * F.greatest(F.least(F.col("_c"), F.col("_q_hi")), F.col("_q_lo"))
        )
        .cast("long")
        .alias("_wsum"),
        F.sum(F.when(F.col("_c") < F.col("_q_lo"), F.col("_f")).otherwise(0))
        .cast("long")
        .alias("n_clamped_low"),
        F.sum(F.when(F.col("_c") > F.col("_q_hi"), F.col("_f")).otherwise(0))
        .cast("long")
        .alias("n_clamped_high"),
    )
    return clamped.select(
        group_col,
        "n_rows",
        "q_lo_cents",
        "q_hi_cents",
        exact_ratio_round6_wide(F.col("_wsum"), F.col("n_rows")).alias(
            "winsorized_mean_cents"
        ),
        "n_clamped_low",
        "n_clamped_high",
    )
