"""Count-min sketch primitives shared by the batch query
(queries/aggregates.py:q_cms_heavy_hitters) and the streaming counter
maintenance (streaming/sketches.py).

The sketch is a DEPTH x WIDTH grid of counters; an item increments one
md5-derived slot per row, and its estimate is the min of its DEPTH
counters (always >= the true count). Counter grids are MERGEABLE by
plain addition — the property that makes the sketch work across
micro-batches, shards, and days without re-reading history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 3  # independent hash rows
CMS_WIDTH = 16  # counters per row (below the fixture vocabulary size, so collisions/overestimates are actually exercised)


def cms_slot(col: Column, row: int) -> Column:
    """md5-derived counter slot of ``col`` in hash row ``row``."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#cms{row}"))), 1, 8), 16, 10)
        .cast("long")
        % CMS_WIDTH
    )


def cms_slots(col: Column) -> Column:
    """Array of (d, pos) structs — one per hash row — for ``col``."""
    return F.array(*[
        F.struct(F.lit(row).alias("d"), cms_slot(col, row).alias("pos"))
        for row in range(CMS_DEPTH)
    ])


def cms_increments(items: DataFrame, item_col: str = "word", weight_col: str | None = None) -> DataFrame:
    """Counter increments (d, pos, counter) for an item stream — one
    map-combinable aggregation bounded by DEPTH*WIDTH groups."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        items.select(w.alias("w"), F.explode(cms_slots(F.col(item_col))).alias("s"))
        .groupBy(F.col("s.d").alias("d"), F.col("s.pos").alias("pos"))
        .agg(F.sum("w").alias("counter"))
    )


def cms_estimate(counters: DataFrame, probes: DataFrame, item_col: str = "word") -> DataFrame:
    """Point estimates for ``probes[item_col]``: min over the item's
    DEPTH counters (missing slots count 0). ``counters`` is the
    (d, pos, counter) grid — broadcast-sized by construction."""
    slotted = probes.select(item_col, F.explode(cms_slots(F.col(item_col))).alias("s")).select(
        item_col, F.col("s.d").alias("d"), F.col("s.pos").alias("pos")
    )
    return (
        slotted.join(F.broadcast(counters), ["d", "pos"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cms_est"))
    )
