"""Detector semantics for tools/plan_audit.py — the audit's flags are a
round gate, so their trigger conditions are pinned here on real plans
built in-session (audit_plan is a pure function over the plan string)."""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from plan_audit import GLOBAL_WINDOW_BOUNDED, GLOBAL_WINDOW_TWINS, audit_plan


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_unpartitioned_window_flags_global_window(spark):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    flags, _, _, _ = audit_plan(
        _plan(df.select("id", F.ntile(4).over(Window.orderBy("id")).alias("b")))
    )
    assert "global-window" in flags


def test_partitioned_window_not_flagged(spark):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    flags, _, _, _ = audit_plan(
        _plan(
            df.select(
                "id", F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("r")
            )
        )
    )
    assert "global-window" not in flags


def test_global_sort_flagged_even_with_a_window_present(spark):
    """The r4 detector exempted any plan containing a Window node; a
    query with BOTH a partitioned window and a separate unbounded global
    ORDER BY must still be flagged (ADVICE r4)."""
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    both = (
        df.select("id", "k", F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("r"))
        .orderBy("r", "id")
    )
    flags, _, _, _ = audit_plan(_plan(both))
    assert "global-sort" in flags


def test_topk_not_flagged_as_global_sort(spark):
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    flags, _, _, _ = audit_plan(_plan(df.orderBy("k").limit(5)))
    assert "global-sort" not in flags


def test_allowlists_are_disjoint_and_twin_names_differ():
    assert not set(GLOBAL_WINDOW_TWINS) & set(GLOBAL_WINDOW_BOUNDED)
    for q, twin in GLOBAL_WINDOW_TWINS.items():
        assert twin != q
    for q, why in GLOBAL_WINDOW_BOUNDED.items():
        assert why.strip()
