"""Smoke tests over the driver contract: entry() runs, every registered
query has a callable + (usually) an oracle, and a representative sample
executes at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as contract

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "q01_pricing_summary",
    "q05_nation_revenue",
    "q_join_outer_order_counts",
    "q_window_rank_orders",
    "q_setop_except_nations",
    "q_etl_clean_cast_filter",
    "q_text_quality_score",
    "q_dedup_exact",
    "q_knn_bruteforce_cosine",
    "q17_small_quantity_revenue",
    "q_session_windows_batch",
    "q_agg_regression",
    "q_doc_chunking",
]


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_registry_shape():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)
    # the vast majority must be oracle-checkable
    assert len(oracles) >= len(qs) - 3


@pytest.mark.parametrize("name", SAMPLE)
def test_query_runs(spark, name):
    df = contract.queries()[name](spark, SF)
    assert df.columns  # has a schema
    df.limit(5).collect()  # executes without error


def test_contract_survives_vanilla_session_confs(spark):
    """The harness hands queries a session WITHOUT session.py's configs;
    catalog.load_tables must self-heal the required confs (nanos parquet
    reads, UTC timezone) at call time."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    # events.parquet is TIMESTAMP(NANOS): unreadable unless load_tables
    # restores the conf
    df = contract.queries()["q_etl_audit_row"](spark, SF)
    assert df.collect()[0]["record_count"] == 1000
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
