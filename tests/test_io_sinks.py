"""Table materialization sinks (sources/io.py): Iceberg-guarded format
switch and the dynamic-partition-overwrite resume contract (north_rule /
DEVIATIONS #9)."""

import os

from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.sources.io import (
    bucketize,
    iceberg_available,
    write_table,
)


def test_format_guard_falls_back_to_parquet(spark, tmp_path):
    """No Iceberg runtime jar in this sandbox -> the guard reports False and
    write_table lands parquet with the same partitioned layout; call sites
    never name a format."""
    assert iceberg_available(spark) is False
    df = spark.range(10).withColumn("bucket", (F.col("id") % 2).cast("int"))
    path = str(tmp_path / "t")
    write_table(df, path, partition_by=["bucket"])
    # hive-style partition dirs, parquet files inside
    assert sorted(d for d in os.listdir(path) if d.startswith("bucket=")) \
        == ["bucket=0", "bucket=1"]
    back = spark.read.parquet(path)
    assert back.count() == 10


def test_dynamic_partition_overwrite_replaces_only_written(spark, tmp_path):
    """Overwrite-by-filter emulation: rewriting bucket 1 must not touch
    bucket 0 (the lineage resume unit)."""
    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "bucket int, v string"
    )
    write_table(full, path, partition_by=["bucket"])
    patch = spark.createDataFrame([(1, "C2"), (1, "C3")], "bucket int, v string")
    write_table(patch, path, partition_by=["bucket"])
    got = {(r["bucket"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(0, "a"), (0, "b"), (1, "C2"), (1, "C3")}


def test_bucketize_deterministic_and_bounded(spark):
    df = bucketize(spark.createDataFrame(
        [("u1",), ("u2",), ("u3",)], "url string"), n_buckets=8)
    rows = {r["url"]: r["bucket"] for r in df.collect()}
    again = {r["url"]: r["bucket"]
             for r in bucketize(df.select("url").repartition(3), n_buckets=8).collect()}
    assert rows == again                      # content-derived, not order-derived
    assert all(0 <= b < 8 for b in rows.values())
