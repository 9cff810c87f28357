"""S3 autodetect read and S10 file-metadata columns."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_spark.sources.readers import read_csv_autodetect, with_file_metadata

CSV = 'entity,Day,total_confirmed_deaths\n"Uni,ted",2021-03-01,1500\nFrance,2021-03-02,250\n'


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("autodetect")
    p = d / "data.csv"
    p.write_text(CSV)
    return str(p)


def test_autodetect_infers_schema(spark, csv_path):
    df = read_csv_autodetect(spark, csv_path)
    # inference: deaths become a numeric type, Day a timestamp/date-like
    types = dict(df.dtypes)
    assert types["total_confirmed_deaths"] in ("int", "bigint", "double")
    assert df.count() == 2
    # quoted comma survives (allow_quoted_newlines analog: multiLine+quotes)
    assert df.filter(F.col("entity") == "Uni,ted").count() == 1


def test_file_metadata_columns(spark, csv_path):
    df = with_file_metadata(spark.read.option("header", "true").csv(csv_path))
    row = df.limit(1).collect()[0]
    assert row["_file_path"].endswith("data.csv")
    assert row["_file_size"] == len(CSV)
    assert row["_file_mtime"] is not None


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Schema evolution on read: parts written before/after a column was
    added unify under mergeSchema, with nulls for the missing column."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p + "/part=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/part=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert {"id", "v", "score", "part"} <= set(df.columns)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5


def test_read_parquet_evolved_contract(spark, tmp_path):
    """read_parquet_evolved pins an evolved directory to a declared
    contract: missing columns come back as typed NULLs, type drift
    try_casts (never aborts under ANSI), undeclared extras drop, and
    column pruning still reaches the scan (r8)."""
    from etl_pipeline_spark.sources.readers import read_parquet_evolved

    p = str(tmp_path / "contract_evolving")
    # v1 writer: no score column; v stores castable + uncastable longs-as-strings
    spark.createDataFrame(
        [(1, "10"), (2, "oops")], "id long, v string"
    ).write.parquet(p + "/batch=1")
    # v2 writer: added score, plus an undeclared debug column
    spark.createDataFrame(
        [(3, "30", 9.5, "x")], "id long, v string, score double, dbg string"
    ).write.parquet(p + "/batch=2")

    df = read_parquet_evolved(
        spark, p, contract="id long, v long, score double, missing_flag boolean"
    )
    assert df.columns == ["id", "v", "score", "missing_flag"]
    assert dict(df.dtypes)["v"] == "bigint"
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["v"] == 10 and rows[2]["v"] is None  # try_cast drift
    assert rows[1]["score"] is None and rows[3]["score"] == 9.5
    assert all(r["missing_flag"] is None for r in rows.values())

    # merged read without contract keeps every observed column
    merged = read_parquet_evolved(spark, p)
    assert {"id", "v", "score", "dbg"} <= set(merged.columns)

    # column pruning survives the evolved read: a 1-column projection
    # must scan only that column (plus the partition dir column)
    plan = read_parquet_evolved(spark, p).select("id")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint>" in plan, plan


def test_read_parquet_evolved_analysis_impossible_drift(spark, tmp_path):
    """Analysis-level drift (advisor find, r8): a declared BIGINT column
    that became array<long> in newer files is unresolvable even for
    try_cast (DATATYPE_MISMATCH at analysis). The contract promises
    NULL-not-abort at BOTH levels, so the whole column must surface as
    typed NULLs while the other declared columns read normally."""
    from etl_pipeline_spark.sources.readers import read_parquet_evolved

    p = str(tmp_path / "structural_drift")
    spark.createDataFrame(
        [(1, [10, 11], "a")], "id long, v array<long>, tag string"
    ).write.parquet(p)

    df = read_parquet_evolved(spark, p, contract="id long, v long, tag string")
    assert df.columns == ["id", "v", "tag"]
    assert dict(df.dtypes)["v"] == "bigint"
    row = df.collect()[0]
    assert row["id"] == 1 and row["tag"] == "a"
    assert row["v"] is None  # structurally impossible cast -> typed NULL


def test_read_parquet_evolved_case_insensitive_contract(spark, tmp_path):
    """r9 review find: files with `Event_ID` satisfy a contract field
    `event_id` under Spark's default case-insensitive resolution — the
    membership check must not null out real data over casing."""
    from etl_pipeline_spark.sources.readers import read_parquet_evolved

    p = str(tmp_path / "cased")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "Event_ID long, Val string"
    ).write.parquet(p)
    df = read_parquet_evolved(spark, p, contract="event_id long, val string")
    rows = {r["event_id"]: r["val"] for r in df.collect()}
    assert rows == {1: "x", 2: "y"}


def test_split_quarantine_returns_cache_handle_on_request(spark, tmp_path):
    """r9 review find: the load-bearing cache() leaked one pinned copy
    per input in loops; return_raw=True hands the caller the parent to
    unpersist, while the two-element default keeps its shape."""
    from etl_pipeline_spark.sources.readers import read_csv_with_schema, split_quarantine
    from pyspark.sql import types as T

    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,a\nbad-line-no-comma\n2,b\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_csv_with_schema(spark, str(p), schema)  # 2-tuple unchanged
    assert good.count() == 2 and bad.count() == 1
    raw_df = spark.read.schema("id long, v string, _corrupt_record string").option(
        "header", "true"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).csv(str(p))
    g, b, raw = split_quarantine(raw_df, return_raw=True)
    assert g.count() == 2 and b.count() == 1
    assert raw.is_cached
    raw.unpersist()
    assert not raw.is_cached
