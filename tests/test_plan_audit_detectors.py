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


def test_window_in_pandas_variant_detected_synthetic():
    """WindowInPandas (pandas window UDF) over a single-partition
    exchange must flag even though the node name differs and extra
    nodes sit between the window and the exchange (r5 review)."""
    plan = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- WindowInPandas [my_udf(v#1) windowspecdefinition(...)], [ts#2 ASC]",
        "   +- Project [v#1, ts#2]",
        "      +- Sort [ts#2 ASC NULLS FIRST], false, 0",
        "         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]",
        "            +- Scan parquet [v#1, ts#2]",
    ])
    flags, _, _, _ = audit_plan(plan)
    assert "global-window" in flags


def test_sibling_single_partition_exchange_not_attributed_to_window():
    """A SinglePartition exchange in a SIBLING branch (e.g. a 1-row
    aggregate epilogue joined below the window's subtree) must not flag
    the partitioned window above it."""
    plan = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- BroadcastHashJoin [k#1], [k#9], Inner, BuildRight",
        "   :- Window [row_number() ...], [k#1], [ts#2 ASC]",
        "   :  +- Sort [k#1 ASC, ts#2 ASC], false, 0",
        "   :     +- Exchange hashpartitioning(k#1, 32), [plan_id=3]",
        "   :        +- Scan parquet [k#1, ts#2]",
        "   +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=8]",
        "      +- HashAggregate(keys=[], functions=[count(1)])",
        "         +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]",
        "            +- Scan parquet []",
    ])
    flags, _, _, _ = audit_plan(plan)
    assert "global-window" not in flags


def test_stale_allowlist_entries_fire_and_clear():
    """An allowlist entry whose query no longer exhibits global-window
    must be reported stale; one whose query still exhibits it must not."""
    from plan_audit import GLOBAL_WINDOW_BOUNDED as B
    from plan_audit import stale_allowlist_entries

    some = next(iter(B))
    assert stale_allowlist_entries({some: {"global-window"}}) == []
    stale = stale_allowlist_entries({some: set()})
    assert stale and some in stale[0] and stale[0].startswith("STALE")
    # queries not planned this run (e.g. PLAN-ERROR) are not judged stale
    assert stale_allowlist_entries({}) == []
