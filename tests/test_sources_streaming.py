"""Tests for bronze ingestion, export sinks, and the streaming change path
(streaming output must equal the batch compaction of the same data)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from stellar_etl_spark.operators.compaction import compact_changes
from stellar_etl_spark.sources import (
    batch_dir_name,
    decode_ledger_files,
    export_batches,
    export_jsonl,
    fake_lcm_decoder,
    read_ledger_files,
    transform_stats,
    write_bronze,
)
from stellar_etl_spark.sources.bronze import read_bronze
from stellar_etl_spark.streaming import (
    read_change_stream,
    stream_compacted_changes,
)

CHANGE_DDL = (
    "ledger_sequence long, change_index long, ledger_key string, "
    "change_type int, value long"
)


def _change_rows():
    # keys k1..k3 across two 64-ledger batches; k2 is created+removed in
    # batch 0 (annihilates); k1 spans both batches
    return [
        (10, 0, "k1", 0, 1),
        (11, 0, "k1", 1, 2),
        (12, 0, "k2", 0, 3),
        (13, 0, "k2", 2, 3),
        (70, 0, "k1", 1, 5),
        (71, 0, "k3", 1, 6),
    ]


class TestBronze:
    def test_binaryfile_roundtrip(self, spark, tmp_path):
        src = tmp_path / "files"
        src.mkdir()
        for seq in (2, 3, 4):
            (src / f"{seq:08d}.xdr.zst").write_bytes(
                seq.to_bytes(4, "big") + b"payload" * seq
            )
        files = read_ledger_files(spark, str(src))
        assert {r.sequence for r in files.select("sequence").collect()} == {2, 3, 4}

        bronze = decode_ledger_files(files, fake_lcm_decoder)
        rows = {r.sequence: r for r in bronze.collect()}
        assert rows[3].protocol_version == 20
        assert rows[3].lcm_xdr.startswith((3).to_bytes(4, "big"))
        # 5s cadence from the fake decoder
        assert (rows[4].closed_at - rows[2].closed_at).total_seconds() == 10

        write_bronze(bronze, str(tmp_path / "bronze"))
        back = read_bronze(spark, str(tmp_path / "bronze"), 3, 4)
        assert {r.sequence for r in back.select("sequence").collect()} == {3, 4}

    def test_partition_pruning_in_plan(self, spark, tmp_path):
        files = read_ledger_files(spark, "/root/testdata")  # any dir; plan only
        plan = files.where(F.col("sequence") == 1)._jdf.queryExecution().toString()
        assert "binaryFile" in plan


class TestSinks:
    def test_export_jsonl_extra_fields(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
        out = str(tmp_path / "out")
        export_jsonl(df, out, extra_fields={"network": "testnet"})
        lines = []
        for f in glob.glob(out + "/part-*"):
            with open(f) as fh:
                lines += [json.loads(line) for line in fh if line.strip()]
        assert len(lines) == 2
        assert all(line["network"] == "testnet" for line in lines)
        # explicit nulls preserved (ExportEntry parity)
        assert any("v" in line and line["v"] is None for line in lines)

    def test_batch_dir_name(self):
        assert batch_dir_name(64, 127, "accounts") == "64-127-accounts"

    def test_export_batches_partitions(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(0, "a"), (0, "b"), (1, "c")], "batch_id long, v string"
        )
        export_batches(df, str(tmp_path), "accounts")
        dirs = {
            os.path.basename(p)
            for p in glob.glob(str(tmp_path / "accounts" / "_batch=*"))
        }
        assert dirs == {"_batch=0", "_batch=1"}

    def test_transform_stats(self, spark):
        att = spark.range(10)
        ok = spark.range(7)
        assert transform_stats(att, ok) == {
            "attempted": 10,
            "successful": 7,
            "failed": 3,
        }


class TestStreaming:
    def test_stream_equals_batch(self, spark, tmp_path):
        src = str(tmp_path / "landing")
        changes = spark.createDataFrame(_change_rows(), CHANGE_DDL)
        changes.write.mode("overwrite").parquet(src)

        out_dir = str(tmp_path / "out")

        def sink(df, epoch_id):
            df.write.mode("append").parquet(out_dir)

        q = stream_compacted_changes(
            read_change_stream(spark, src, CHANGE_DDL),
            sink,
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)

        streamed = spark.read.parquet(out_dir)
        batch = compact_changes(
            changes.withColumn(
                "batch_id", F.expr("cast(ledger_sequence / 64 as long)")
            )
        )
        key = lambda r: (r["batch_id"], r["ledger_key"])  # noqa: E731
        s_rows = {key(r): r for r in streamed.collect()}
        b_rows = {key(r): r for r in batch.collect()}
        assert set(s_rows) == set(b_rows)
        # k2 annihilated; k1 present in both batches with last values
        assert (0, "k2") not in s_rows
        assert s_rows[(0, "k1")].value == 2 and s_rows[(1, "k1")].value == 5
        for k in b_rows:
            assert s_rows[k].effective_change_type == b_rows[k].effective_change_type
            assert s_rows[k].deleted == b_rows[k].deleted


class TestStatefulStreaming:
    def test_running_state_across_microbatches(self, spark, tmp_path):
        import time

        from stellar_etl_spark.streaming.stateful import stream_running_state

        ddl = (
            "ledger_key string, ledger_sequence long, change_index long, "
            "change_type int, payload string"
        )
        src = str(tmp_path / "landing")
        # two files → with maxFilesPerTrigger=1, two sequential micro-batches
        spark.createDataFrame(
            [("k1", 10, 0, 1, "a"), ("k2", 11, 0, 1, "x")], ddl
        ).coalesce(1).write.mode("overwrite").parquet(src)
        spark.createDataFrame(
            [("k1", 20, 0, 1, "b"), ("k2", 21, 0, 2, "x")], ddl
        ).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream_running_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("running_state")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        time.sleep(0.5)

        rows = spark.sql(
            "SELECT * FROM running_state ORDER BY ledger_sequence"
        ).collect()
        # state carried across micro-batches: latest per key wins
        last = {}
        for r in rows:
            last[r.ledger_key] = r
        assert last["k1"].payload == "b" and not last["k1"].deleted
        assert last["k2"].deleted  # removed in the second batch


class TestBucketedLayout:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir):
        import contextlib
        import io

        from stellar_etl_spark.sources.bucketed import (
            co_located_join,
            write_bucketed,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        ).withColumnRenamed("l_orderkey", "orderkey")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        ).withColumnRenamed("o_orderkey", "orderkey")

        write_bucketed(li, "t_lineitem_b", "orderkey", n_buckets=8)
        write_bucketed(orders, "t_orders_b", "orderkey", n_buckets=8)
        # disable auto-broadcast so the bucketed SMJ path is what's planned
        # (at real fact×fact scale neither side would broadcast anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = co_located_join(spark, "t_lineitem_b", "t_orders_b", "orderkey")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            # co-located: SMJ over bucket files, zero shuffles
            assert "SortMergeJoin" in plan
            assert "Exchange (" not in plan
            # and the join is actually correct
            assert joined.count() == li.join(orders, "orderkey").count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
