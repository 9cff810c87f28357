"""Scale-claim regression tests via the plans helpers: pushdown reaches
the scans, dimensions broadcast, top-k compiles to heap selection."""

from __future__ import annotations

import __spark_entry__ as contract

from etl_pipeline_spark import plans

SF = "/root/testdata/sf0.001"


def test_q06_filters_pushed(spark):
    df = contract.queries()["q06_revenue_delta"](spark, SF)
    plans.assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q05_broadcasts_dimensions(spark):
    df = contract.queries()["q05_nation_revenue"](spark, SF)
    plans.assert_broadcast_join(df)


def test_topk_is_take_ordered(spark):
    df = contract.queries()["q_topk_expensive_orders"](spark, SF)
    plans.assert_take_ordered(df)


def test_narrow_etl_chain_has_no_shuffle(spark):
    df = contract.queries()["q_etl_clean_cast_filter"](spark, SF)
    plans.assert_no_shuffle(df)
