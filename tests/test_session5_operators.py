"""Semantics invariants for the session-5 operators, beyond the DuckDB
oracle: conservation laws and structural properties at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as contract
from etl_pipeline_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


def test_markov_stationary_is_a_distribution(spark):
    rows = contract.queries()["q_markov_stationary"](spark, SF).collect()
    total = sum(r.stationary_prob for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    assert all(0 <= r.stationary_prob <= 1 for r in rows)


def test_attribution_conserves_purchases(spark):
    e = load_tables(spark, SF, ("events",))["events"]
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    rows = contract.queries()["q_attribution_last_touch"](spark, SF).collect()
    assert sum(r.n_purchases for r in rows) == n_purchases
    assert {r.touch_type for r in rows} <= {"view", "click", "signup", "error", "direct"}


def test_zorder_prefix_bounds_both_dims(spark):
    """A z-prefix of 8 bits fixes the top 4 bits of each dimension, so
    per-prefix spans are < 16 in BOTH dimensions — the locality property
    that makes one layout prune two-dimensional predicates."""
    rows = contract.queries()["q_zorder_locality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.a_span < 16, r
        assert r.b_span < 16, r


def test_skyline_is_exactly_the_pareto_frontier(spark):
    p = load_tables(spark, SF, ("part",))["part"].select(
        "p_partkey", "p_retailprice", "p_size"
    )
    parts = [(r.p_partkey, r.p_retailprice, r.p_size) for r in p.collect()]
    got = {r.p_partkey for r in contract.queries()["q_skyline_parts"](spark, SF).collect()}

    def dominated(x):
        return any(
            q[1] <= x[1] and q[2] <= x[2] and (q[1] < x[1] or q[2] < x[2])
            for q in parts
        )

    expect = {k for (k, pr, sz) in parts if not dominated((k, pr, sz))}
    assert got == expect


def test_rolling_users_dominates_daily_distinct(spark):
    e = load_tables(spark, SF, ("events",))["events"]
    daily = {
        r.day: r.n
        for r in e.select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = contract.queries()["q_rolling_active_users"](spark, SF).collect()
    assert {r.day for r in rows} == set(daily)
    for r in rows:
        assert r.rolling_7d_users >= daily[r.day]


def test_interval_concurrency_bounds(spark):
    e = load_tables(spark, SF, ("events",))["events"]
    per_type = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    rows = contract.queries()["q_interval_concurrency"](spark, SF).collect()
    for r in rows:
        assert 1 <= r.max_concurrent <= per_type[r.event_type]


def test_hashed_score_token_conservation(spark):
    d = load_tables(spark, SF, ("documents",))["documents"]
    n_tokens = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()
    }
    rows = contract.queries()["q_hashed_linear_score"](spark, SF).collect()
    assert len(rows) == len(n_tokens)
    for r in rows:
        assert r.n_tokens == n_tokens[r.doc_id]


def test_erasure_cascade_accounting(spark):
    rows = {r.table_name: r for r in contract.queries()["q_erasure_cascade"](spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert r.n_rows == r.n_erased + r.n_remaining
    # the cascade reaches every tier in this fixture
    assert rows["customer"].n_erased > 0
    assert rows["lineitem"].n_erased > 0
