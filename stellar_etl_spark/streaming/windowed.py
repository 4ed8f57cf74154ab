"""Watermarked event-time windowing for unbounded event streams.

Beyond-reference surface: the reference's streaming mode is strictly
sequential ledger batches with no event-time semantics (SURVEY.md §2.8), but
an analytics engine ingesting event streams at scale needs late-data
handling.  These operators are the Structured-Streaming-native pattern:
``withWatermark`` bounds state, event-time windows finalize exactly once in
append mode, and late events merge into open windows (or drop once the
watermark passes) without any custom state code.

Each operator is a pure DataFrame→DataFrame function that works identically
on a batch DataFrame (watermark is a no-op there), so batch twins double as
correctness oracles — same pattern as streaming/micro_batch.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarked_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    watermark: str = "10 minutes",
    window_duration: str = "5 minutes",
    slide: str | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a watermark.

    In append-mode streaming a window row is emitted exactly once — when the
    watermark passes its end — so downstream sinks get finalized, immutable
    aggregates.  Late events within the watermark merge into their (still
    open) window; events later than the watermark are dropped by the engine.
    State is bounded: windows older than the watermark are evicted.

    The aggregation is a plain groupBy, so in batch mode Catalyst gives the
    usual partial-aggregate (map-side combine) plan; in streaming it becomes
    a stateful aggregation keyed by (window, keys) — shuffle on exactly those
    keys, nothing else.
    """
    window = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(window.alias("window"), *[F.col(k) for k in key_cols])
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(k) for k in key_cols],
            F.col("n_events"),
            *([F.col("total_value")] if value_col is not None else []),
        )
    )


def timebound_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    max_lag_seconds: int = 1800,
    right_prefix: str = "right_",
) -> DataFrame:
    """Stream-stream inner join bounded in event time: right rows qualify
    within ``[left_ts - max_lag, left_ts]`` for the same key — the streaming
    form of attribution/enrichment joins.

    Both inputs carry watermarks AND the join condition bounds the two event
    times against each other, which is exactly what Structured Streaming
    needs to evict join state: a buffered right row can be dropped once the
    left watermark passes ``right_ts + max_lag``.  Without the time bound the
    state grows forever; with it, state is O(arrival rate × lag window).

    Works identically on batch DataFrames (watermarks are no-ops), so the
    batch run is the oracle for the streaming run.
    """
    r_cols = [
        F.col(c).alias(c if c == on else f"{right_prefix}{c}")
        for c in right.columns
    ]
    l = left.withWatermark(left_ts, watermark)
    r = right.select(*r_cols).withWatermark(f"{right_prefix}{right_ts}", watermark)
    pref_ts = f"{right_prefix}{right_ts}"
    cond = (
        (l[on] == r[on])
        & (F.col(pref_ts) <= F.col(left_ts))
        & (
            F.col(pref_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag_seconds} SECONDS")
        )
    )
    return l.join(r, cond).drop(r[on])


def dedup_within_watermark(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once event ingestion: drop re-deliveries of the same key that
    arrive within the watermark interval.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
    until the watermark passes its event time — bounded state, unlike a
    global ``dropDuplicates`` whose streaming state grows forever.  This is
    the at-least-once→exactly-once adapter in front of every append sink.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream–static enrichment join: a streaming fact against a batch
    dimension table.

    This is the streaming twin of the batch broadcast-dim join (the engine's
    default for region/nation/asset lookups): the static side is planned as
    a broadcast per micro-batch — stateless, no watermark, no join state to
    evict, which is why dimension lookups should NEVER be expressed as
    stream-stream joins.

    Refresh caveat: a plain ``spark.read.parquet(dir)`` dim captures its
    FILE LISTING when the DataFrame is created — each micro-batch re-runs
    the plan against that frozen snapshot, so files appended later are
    invisible and files deleted by an external overwrite make batches
    fail.  To pick up a dim maintained by an external writer, rebuild the
    dim DataFrame per batch (foreachBatch) or read it through a table
    format with snapshot refresh (a catalog table / Delta-style source).
    """
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), keys, how)
