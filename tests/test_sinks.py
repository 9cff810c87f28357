"""Sink tests (S12-S16): bucketed co-located joins (no exchange in the
plan), observe-based single-pass audit, DDL idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.sources.sinks import (
    create_database_if_not_exists,
    create_table_if_not_exists,
    write_bucketed,
    write_with_observed_audit,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    # disable broadcast so the planner must choose sort-merge — at real
    # scale both sides are too big to broadcast, which is when bucketing
    # pays off
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket co-location: the join must run without any SHUFFLE exchange
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "SortMergeJoin" in plan, plan[:400]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_write_with_observed_audit_single_pass(spark):
    df = spark.read.parquet(f"{SF}/region.parquet")
    n = write_with_observed_audit(df, "obs_main", "obs_audit", "/data/region.parquet")
    assert n == 5
    audit = spark.table("obs_audit").collect()[-1]
    assert audit["record_count"] == 5
    assert audit["file_name"] == "region.parquet"
    assert spark.table("obs_main").count() == 5


def test_ddl_idempotent(spark):
    create_database_if_not_exists(spark, "etl_meta")
    create_database_if_not_exists(spark, "etl_meta")  # second call: no error
    create_table_if_not_exists(spark, "etl_meta.t1", "id BIGINT, name STRING")
    create_table_if_not_exists(spark, "etl_meta.t1", "id BIGINT, name STRING")
    assert spark.table("etl_meta.t1").columns == ["id", "name"]


def test_partitioned_write_prunes_partitions(spark, tmp_path_factory):
    """Hive-style partitioned layout: a filter on the partition column
    must prune at planning time (PartitionFilters in the scan), reading
    only the matching directory — the layout that makes 100 TB scans
    selective."""
    out = str(tmp_path_factory.mktemp("part") / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan, plan[:600]
    n_en = docs.filter(F.col("lang") == "en").count()
    assert back.count() == n_en


def test_compact_parquet_reduces_files(spark, tmp_path_factory):
    from etl_pipeline_spark.sources.sinks import compact_parquet

    out = str(tmp_path_factory.mktemp("compact") / "many")
    # simulate a streaming sink's tiny-file accumulation: 16 appends
    for i in range(16):
        spark.range(i * 100, (i + 1) * 100).write.mode("append").parquet(out)
    import glob as g
    n_before = len(g.glob(f"{out}/*.parquet"))
    assert n_before >= 16
    compact_parquet(spark, out, target_file_mb=128)
    n_after = len(g.glob(f"{out}/*.parquet"))
    assert n_after < n_before
    df = spark.read.parquet(out)
    assert df.count() == 1600
    assert df.agg({"id": "min"}).collect()[0][0] == 0


def test_compact_parquet_crash_recovery(spark, tmp_path_factory):
    """A crash between compact_parquet's two renames strands the data at
    <path>__old with nothing at <path>; recover_compaction restores it,
    and the next compact_parquet call self-heals before compacting."""
    import shutil

    from etl_pipeline_spark.sources.sinks import compact_parquet, recover_compaction

    out = str(tmp_path_factory.mktemp("recover") / "data")
    spark.range(100).write.parquet(out)
    # simulate the crash window: old moved out, new never moved in
    shutil.move(out, out + "__old")
    assert recover_compaction(out) is True
    assert spark.read.parquet(out).count() == 100

    # and the in-API path: a stale __old plus a live path (crash after
    # swap, before cleanup) is cleaned up by the next compaction
    spark.range(50).write.mode("overwrite").parquet(out + "__old")
    compact_parquet(spark, out, target_file_mb=128)
    import os

    assert not os.path.exists(out + "__old")
    assert spark.read.parquet(out).count() == 100


def test_upsert_parquet_merges_by_key(spark, tmp_path_factory):
    from etl_pipeline_spark.sources.sinks import upsert_parquet

    out = str(tmp_path_factory.mktemp("upsert") / "tbl")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    ).write.parquet(out)
    updates = spark.createDataFrame(
        [(2, "b2", 21), (4, "d", 40)], "id long, name string, v long"
    )
    n = upsert_parquet(spark, out, updates, ["id"])
    assert n == 4
    rows = {r["id"]: (r["name"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert rows[1] == ("a", 10)      # untouched survives
    assert rows[2] == ("b2", 21)     # updated in place
    assert rows[4] == ("d", 40)      # new key inserted

    # upsert into a not-yet-existing table just writes it
    out2 = str(tmp_path_factory.mktemp("upsert") / "fresh")
    assert upsert_parquet(spark, out2, updates, ["id"]) == 2
