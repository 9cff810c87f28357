"""Incremental rollup maintenance (partition-granular refresh) and
stream-stream joins with watermarks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.rollup_maintenance import (
    PARTITION_COL,
    build_rollup,
    refresh_rollup,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(ts, et, v) for ts, et, v in rows], "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")


def test_incremental_rollup_refresh(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rollup") / "hourly")
    base = _events(
        spark,
        [
            ("2024-01-01 00:10:00", "click", 1.0),
            ("2024-01-01 00:40:00", "click", 2.0),
            ("2024-01-01 01:10:00", "view", 3.0),
        ],
    )
    build_rollup(base, out)
    r0 = {
        (r[PARTITION_COL], r["event_type"]): r["sum_value"]
        for r in spark.read.parquet(out).collect()
    }
    assert r0[("2024-01-01-00", "click")] == 3.0
    assert r0[("2024-01-01-01", "view")] == 3.0

    # new + late data touching ONLY hour 01
    late = _events(spark, [("2024-01-01 01:50:00", "view", 4.0)])
    all_events = base.union(late)
    # capture hour-00 partition file mtimes to prove it is not rewritten
    h0_dir = os.path.join(out, f"{PARTITION_COL}=2024-01-01-00")
    before = {f: os.path.getmtime(os.path.join(h0_dir, f)) for f in os.listdir(h0_dir)}
    touched = refresh_rollup(spark, all_events, late, out)
    assert touched == ["2024-01-01-01"]
    after = {f: os.path.getmtime(os.path.join(h0_dir, f)) for f in os.listdir(h0_dir)}
    assert before == after, "hour-00 partition must be untouched"
    r1 = {
        (r[PARTITION_COL], r["event_type"]): r["sum_value"]
        for r in spark.read.parquet(out).collect()
    }
    assert r1[("2024-01-01-01", "view")] == 7.0  # merged late row
    assert r1[("2024-01-01-00", "click")] == 3.0  # history intact


def test_stream_stream_join(spark, tmp_path_factory):
    from etl_pipeline_spark.streaming.joins import clicks_to_purchases

    d = tmp_path_factory.mktemp("ssj")
    clicks = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1, 100),
            ("2024-01-01 10:00:00", 2, 200),
        ],
        "ts_s string, user_id long, event_id long",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_id")
    purchases = spark.createDataFrame(
        [
            ("2024-01-01 10:30:00", 1, 9.99),   # within 1h of user 1's click
            ("2024-01-01 12:30:00", 2, 5.00),   # too late for user 2's click
        ],
        "ts_s string, user_id long, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
    clicks.write.parquet(str(d / "clicks"))
    purchases.write.parquet(str(d / "purchases"))
    cs = spark.readStream.schema(clicks.schema).parquet(str(d / "clicks"))
    ps = spark.readStream.schema(purchases.schema).parquet(str(d / "purchases"))
    q = (
        clicks_to_purchases(cs, ps)
        .writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_ssj").collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 1 and rows[0]["purchase_value"] == 9.99


def test_stream_static_enrichment(spark, tmp_path_factory):
    """Stream-static join: each micro-batch broadcasts the dimension;
    rows with no dimension match survive a left join with nulls."""
    from etl_pipeline_spark.streaming.joins import enrich_with_dimension

    d = tmp_path_factory.mktemp("ss_src")
    events = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1, 10.0), ("2024-01-01 00:01:00", 2, 20.0),
         ("2024-01-01 00:02:00", 99, 5.0)],
        "ts_s string, user_id long, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "value")
    events.write.parquet(str(d / "data"))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "dim_user long, tier string"
    )
    stream = spark.readStream.schema(events.schema).parquet(str(d / "data"))
    q = (
        enrich_with_dimension(stream, dim, "user_id", "dim_user")
        .writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r["tier"] for r in spark.table("t_enriched").collect()}
    assert rows == {1: "gold", 2: "silver", 99: None}


def test_stream_static_enrichment_same_key_name(spark, tmp_path_factory):
    """Regression (r4 ADVICE): stream and dimension sharing the join
    column NAME must not raise an ambiguous-reference error — the join
    condition is frame-qualified, not name-resolved."""
    from etl_pipeline_spark.streaming.joins import enrich_with_dimension

    d = tmp_path_factory.mktemp("ss_samekey")
    events = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (99, 5.0)], "user_id long, value double"
    )
    events.write.parquet(str(d / "data"))
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id long, tier string")
    stream = spark.readStream.schema(events.schema).parquet(str(d / "data"))
    q = (
        enrich_with_dimension(stream, dim, "user_id", "user_id")
        .select(stream["user_id"].alias("uid"), "tier")
        .writeStream.format("memory")
        .queryName("t_enriched_samekey")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["uid"]: r["tier"] for r in spark.table("t_enriched_samekey").collect()}
    assert rows == {1: "gold", 2: "silver", 99: None}
