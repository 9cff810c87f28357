"""Plan inspection helpers — the assertions behind the engine's scale
claims, usable in tests and ad-hoc tuning sessions.

    from etl_pipeline_spark import plans
    plans.assert_no_shuffle(df)          # bucketed/co-located path
    plans.assert_pushed_filters(df, "l_shipdate")
    plans.assert_partition_pruned(df, "lang")
    print(plans.formatted(df))           # full formatted physical plan
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df: DataFrame) -> str:
    """The 'formatted' explain output (operator tree + per-node details)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def assert_no_shuffle(df: DataFrame) -> None:
    """Fails if the plan contains a shuffle exchange (broadcast exchanges
    are allowed — they move only the small side)."""
    plan = executed(df)
    assert "Exchange hashpartitioning" not in plan and "Exchange rangepartitioning" not in plan, (
        "plan contains a shuffle exchange:\n" + plan[:800]
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = executed(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "no broadcast join in plan:\n" + plan[:800]
    )


def assert_pushed_filters(df: DataFrame, *columns: str) -> None:
    """Fails unless every named column appears in the scan's PushedFilters
    — i.e. the predicate reached the parquet reader."""
    plan = formatted(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed, "no PushedFilters section in plan:\n" + plan[:800]
    blob = " ".join(pushed)
    for col in columns:
        assert col in blob, f"filter on {col!r} not pushed; PushedFilters: {blob[:400]}"


def assert_partition_pruned(df: DataFrame, partition_col: str) -> None:
    """Fails unless the scan prunes on the given partition column at
    planning time (Hive-layout directory pruning)."""
    plan = executed(df)
    assert "PartitionFilters" in plan and partition_col in plan, (
        f"no partition pruning on {partition_col!r}:\n" + plan[:800]
    )


def assert_partitioned_window(df: DataFrame, partition_col: str) -> None:
    """Fails unless every Window node in the plan partitions on the given
    column — i.e. no single-partition WindowExec ("No Partition Defined"
    warning), the sort is bounded per key and scales with the data."""
    plan = executed(df)
    window_lines = [line for line in plan.splitlines() if "Window " in line]
    assert window_lines, "no Window node in plan:\n" + plan[:800]
    for line in window_lines:
        assert partition_col in line, (
            f"Window node not partitioned by {partition_col!r}: {line[:300]}"
        )


def assert_take_ordered(df: DataFrame) -> None:
    """Fails unless a global ORDER BY + LIMIT compiled to the heap-based
    TakeOrderedAndProject (no full sort)."""
    plan = executed(df)
    assert "TakeOrderedAndProject" in plan, plan[:800]
