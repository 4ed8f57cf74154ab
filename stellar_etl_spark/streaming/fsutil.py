"""Shared URI-agnostic Hadoop FileSystem helpers for driver-side metadata
IO (checkpoint-adjacent fingerprint logs, run tokens, layout validation).

One py4j round-trip per operation — NEVER per byte (py4j call latency
turns per-byte reads into minutes once a log grows), and never a Spark
job (a Spark write for a few hundred bytes measured ~4.5 s of pure job
overhead inside foreachBatch)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, uri: str):
    """(FileSystem, Path) for any Hadoop-supported scheme — local fs in
    tests, the cluster FS in deployment."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def read_utf8(spark: SparkSession, fs, jpath) -> str:
    """Whole-file UTF-8 read through commons-io (ships on Spark's
    classpath) — one py4j round-trip for the full payload."""
    stream = fs.open(jpath)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()
