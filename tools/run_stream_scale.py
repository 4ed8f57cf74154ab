"""Streaming compaction scale probe (round-8 verdict item 7).

The batch operator families carry 10x/100x probes in SCALE.md; the
``foreachBatch`` change-export path has the 1,024-window soak
(tests/test_sources_streaming.py) but no scaled-BATCH-SIZE evidence.  This
probe runs the SAME ``stream_compacted_changes`` pipeline at two window
scales — the reference's default 64-ledger window and a 100x 6,400-ledger
window — with identical total change volume, and reports per-micro-batch
durations {first, steady} straight from the StreamingQuery progress
events.

What it demonstrates: compaction cost per window is linear in the window's
row count (the compactor is one hash aggregate keyed by (batch_id,
ledger_key) — operators/compaction.py), so a 100x window is one 100x-larger
map-side-combined aggregate, not 100 sequential stalls; and micro-batch
overhead (offset log, file listing, planning) amortizes with window size.

Usage: python tools/run_stream_scale.py [changes_per_ledger] [n_windows]
Prints one JSON line per scale.

Round-9 addition: ``python tools/run_stream_scale.py soak`` runs the
KILL/RESTART soak at the 100x window size (verdict item 5) — the 6,400-
ledger window drained through repeated mid-stream kills (q.stop() after the
first in-flight micro-batch, i.e. between epoch sink-write and offset
commit is fair game) with an epoch-idempotent sink (overwrite per
``epoch=<id>`` dir — the same replay-safe layout streaming/ingest and
agg_maintenance use).  Final audit: full-row parity with the batch
``compact_changes`` twin — exactly-once (no doubled epochs), gap-free
(every window present), value-correct (last-wins per key per window).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scale(spark, batch_size: int, n_windows: int, per_ledger: int) -> dict:
    from pyspark.sql import functions as F

    from stellar_etl_spark.streaming.micro_batch import (
        read_change_stream,
        stream_compacted_changes,
    )

    root = tempfile.mkdtemp(prefix=f"stream_scale_{batch_size}_")
    src, out, ckpt = f"{root}/landing", f"{root}/out", f"{root}/ckpt"
    total_ledgers = batch_size * n_windows
    ddl = (
        "ledger_sequence long, change_index long, ledger_key string, "
        "change_type int, value long"
    )

    # per_ledger changes per ledger over a 10k-key universe: windows carry
    # real per-key multiplicity so compaction does actual last-wins work.
    # WINDOW-ALIGNED landing: repartition BY THE WINDOW ID, so every
    # window's rows land wholly in one file regardless of how the CLI's
    # n_windows divides spark.range's parallelism — the reference's
    # sequential-ChangeBatch contract, now enforced by
    # stream_compacted_changes' fingerprint guard.  (A hash-scattered
    # repartition by nothing used to make the probe silently measure a
    # duplicating stream — each trigger emitted its own partial compaction
    # of the same windows — and a plain coalesce only aligns when the
    # range partition count divides n_windows, because the file source's
    # delivery order for same-mtime files is arbitrary.)
    from pyspark.sql import functions as F  # noqa: F811

    spark.range(total_ledgers * per_ledger).selectExpr(
        f"id div {per_ledger} as ledger_sequence",
        f"id % {per_ledger} as change_index",
        "concat('k', (id * 2654435761) % 10000) as ledger_key",
        "cast(1 as int) as change_type",
        "id as value",
    ).repartition(
        n_windows, F.expr(f"ledger_sequence div {batch_size}")
    ).write.mode("overwrite").parquet(src)

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out)

    # ONE landed-file set per window scale; maxFilesPerTrigger sized so the
    # availableNow drain takes several micro-batches (per-epoch timings)
    t0 = time.time()
    q = stream_compacted_changes(
        read_change_stream(spark, src, ddl, max_files_per_trigger=2),
        sink,
        checkpoint_dir=ckpt,
        batch_size=batch_size,
        available_now=True,
    )
    q.awaitTermination(1800)
    wall = time.time() - t0
    batches = [
        {
            "rows": p["numInputRows"],
            "ms": p["durationMs"].get("triggerExecution"),
        }
        for p in (q.recentProgress or [])
        if p["numInputRows"]
    ]
    n_out = spark.read.parquet(out).count()
    shutil.rmtree(root, ignore_errors=True)
    durs = [b["ms"] for b in batches if b["ms"] is not None]
    return {
        "batch_size_ledgers": batch_size,
        "n_windows": n_windows,
        "total_change_rows": total_ledgers * per_ledger,
        "compacted_rows": n_out,
        "micro_batches": len(batches),
        "first_batch_ms": durs[0] if durs else None,
        "steady_batch_ms_min": min(durs[1:]) if len(durs) > 1 else None,
        "steady_batch_ms_med": (
            sorted(durs[1:])[len(durs[1:]) // 2] if len(durs) > 1 else None
        ),
        "wall_s": round(wall, 2),
        "rows_per_s": round(total_ledgers * per_ledger / wall),
    }


def soak_kill_restart(
    spark, batch_size: int = 6400, n_windows: int = 16, per_ledger: int = 20
) -> dict:
    """Mid-stream kill/restart soak at the scaled window size."""
    import glob

    from stellar_etl_spark.operators.compaction import compact_changes
    from stellar_etl_spark.streaming.micro_batch import (
        batch_id_col,
        read_change_stream,
        stream_compacted_changes,
    )

    root = tempfile.mkdtemp(prefix=f"stream_soak_{batch_size}_")
    src, out, ckpt = f"{root}/landing", f"{root}/out", f"{root}/ckpt"
    total_ledgers = batch_size * n_windows
    ddl = (
        "ledger_sequence long, change_index long, ledger_key string, "
        "change_type int, value long"
    )
    changes = spark.range(total_ledgers * per_ledger).selectExpr(
        f"id div {per_ledger} as ledger_sequence",
        f"id % {per_ledger} as change_index",
        "concat('k', (id * 2654435761) % 10000) as ledger_key",
        "cast(1 as int) as change_type",
        "id as value",
    )
    # window-aligned landing: repartition by the window id, every window
    # wholly in one file (see run_scale's note)
    from pyspark.sql import functions as F  # noqa: F811

    changes.repartition(
        n_windows, F.expr(f"ledger_sequence div {batch_size}")
    ).write.mode("overwrite").parquet(src)

    # WINDOW-idempotent sink (dynamic partition overwrite on batch_id):
    # hard-kill recovery can re-deliver committed windows in differently-
    # shaped epochs (observed — see micro_batch.py's fingerprint guard),
    # so idempotency must key on the WINDOW, not the epoch id; the
    # compacted content per window is deterministic, so any replay
    # overwrites a window with identical rows
    def sink(df, epoch_id):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )

    def start():
        return stream_compacted_changes(
            read_change_stream(spark, src, ddl, max_files_per_trigger=4),
            sink,
            checkpoint_dir=ckpt,
            batch_size=batch_size,
            available_now=True,
        )

    # q.stop() joins the stream thread, which may itself be blocked inside
    # the foreachBatch Python callback — an unbounded stop (the default
    # stopTimeout=0) deadlocks; bound it so the kill is a hard interrupt,
    # which is the crash semantics the soak wants anyway
    spark.conf.set("spark.sql.streaming.stopTimeout", "15s")
    kills = 0
    t0 = time.time()
    for _kill in range(3):  # three mid-stream kills before the final drain
        q = start()
        # kill as soon as at least one micro-batch has gone through —
        # q.stop() interrupts whatever epoch is in flight at that moment
        deadline = time.time() + 300
        while time.time() < deadline and q.isActive:
            if any(p["numInputRows"] for p in (q.recentProgress or [])):
                break
            time.sleep(0.2)
        try:
            q.stop()
        except Exception:  # noqa: BLE001 — bounded stop may raise on join
            pass
        q.awaitTermination(60)
        kills += 1
    q = start()
    q.awaitTermination(1800)  # final drain to completion
    wall = time.time() - t0

    from pyspark.sql import functions as F

    batch_twin = compact_changes(
        changes.withColumn("batch_id", batch_id_col(batch_size=batch_size))
    )
    # partition-column inference reads batch_id back as int; realign to the
    # twin's long before the full-row diff
    streamed = spark.read.parquet(out).withColumn(
        "batch_id", F.col("batch_id").cast("long")
    ).select(*batch_twin.columns)
    extra = streamed.exceptAll(batch_twin).count()
    missing = batch_twin.exceptAll(streamed).count()
    n_windows_out = streamed.select("batch_id").distinct().count()
    n_rows = streamed.count()
    n_window_dirs = len(glob.glob(f"{out}/batch_id=*"))
    shutil.rmtree(root, ignore_errors=True)
    return {
        "soak": "kill_restart_100x_window",
        "batch_size_ledgers": batch_size,
        "n_windows": n_windows,
        "total_change_rows": total_ledgers * per_ledger,
        "mid_stream_kills": kills,
        "window_dirs": n_window_dirs,
        "compacted_rows": n_rows,
        "windows_present": n_windows_out,
        "rows_extra_vs_batch": extra,
        "rows_missing_vs_batch": missing,
        "exactly_once_gap_free": extra == 0
        and missing == 0
        and n_windows_out == n_windows,
        "wall_s": round(wall, 2),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "soak":
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .appName("stream-soak-kill-restart")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps(soak_kill_restart(spark)))
        spark.stop()
        return
    per_ledger = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("stream-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same WINDOW COUNT at both scales → the 6,400-ledger run carries 100x
    # the change rows per window; the question is whether steady per-batch
    # time grows ~linearly in window rows (amortized overhead, parallel
    # aggregate) rather than super-linearly
    for batch_size in (64, 6400):
        print(json.dumps(run_scale(spark, batch_size, n_windows, per_ledger)))
    spark.stop()


if __name__ == "__main__":
    main()
