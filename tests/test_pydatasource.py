"""Custom Python data source (Spark 4 API): batch partition-parallel
read, determinism across re-reads and partitionings, and the micro-batch
stream reader sharing the same generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.sources.pydatasource import (
    SyntheticEventsDataSource,
    _row,
)


def _register(spark):
    # idempotent: re-registering the same name just overwrites
    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_count_schema_and_partitions(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 4)
        .load()
    )
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.count() == 1000
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 4


def test_batch_read_is_deterministic_across_partitionings(spark):
    _register(spark)
    a = (
        spark.read.format("synthetic_events")
        .option("rows", 300)
        .option("partitions", 3)
        .load()
    )
    b = (
        spark.read.format("synthetic_events")
        .option("rows", 300)
        .option("partitions", 7)
        .load()
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # spot-check against the pure generator
    row = a.filter(F.col("event_id") == 42).collect()[0]
    assert tuple(row) == _row(42)


def test_stream_reader_replays_same_rows(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .option("max_rows", 150)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 150
    # stream rows equal the batch read of the same range — shared generator
    batch = (
        spark.read.format("synthetic_events").option("rows", 150).load()
    )
    assert got.exceptAll(batch).count() == 0


def test_synthetic_source_rows_zero_returns_empty(spark):
    """r9 review find: rows=0 made partitions() return [], which
    PySpark's worker substitutes with [None]; read(None) crashed with
    AttributeError instead of yielding an empty DataFrame."""
    _register(spark)
    out = (
        spark.read.format("synthetic_events").option("rows", 0).load().collect()
    )
    assert out == []
