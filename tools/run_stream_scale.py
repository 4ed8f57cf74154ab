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
    # real per-key multiplicity so compaction does actual last-wins work
    spark.range(total_ledgers * per_ledger).selectExpr(
        f"id div {per_ledger} as ledger_sequence",
        f"id % {per_ledger} as change_index",
        "concat('k', (id * 2654435761) % 10000) as ledger_key",
        "cast(1 as int) as change_type",
        "id as value",
    ).repartition(32).write.mode("overwrite").parquet(src)

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out)

    # ONE landed-file set per window scale; maxFilesPerTrigger sized so the
    # availableNow drain takes several micro-batches (per-epoch timings)
    t0 = time.time()
    q = stream_compacted_changes(
        read_change_stream(spark, src, ddl, max_files_per_trigger=8),
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


def main():
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
