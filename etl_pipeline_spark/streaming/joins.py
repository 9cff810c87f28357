"""Stream-stream joins — SURVEY.md §2.9 EXT surface: correlate two live
event streams within a bounded time window (the watermark bounds both
sides' state).

The canonical attribution shape: click streams joined to purchase
streams where the purchase happens within an hour after the click.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_to_purchases(
    clicks: DataFrame, purchases: DataFrame, max_gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Inner stream-stream join: same user, purchase within ``max_gap``
    after the click. Both sides carry watermarks so Spark can evict state
    for rows that can no longer match."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join — the dimension-lookup half of every
    streaming pipeline (events joined to a slowly-changing reference
    table). The static side is broadcast per micro-batch, so the stream
    never shuffles; Spark re-plans the join each batch, which also picks
    up dimension-table refreshes between batches for file-based dims.

    Scale: state-free (unlike stream-stream joins) — the only cost is
    the broadcast, bounded by the dimension size."""
    # Same-named keys join on the NAME LIST, which deduplicates the key
    # column in the output (r9 review: the frame-qualified form kept
    # BOTH copies, so the AMBIGUOUS_REFERENCE merely moved to the first
    # downstream reference). Differently-named keys keep the qualified
    # predicate — no ambiguity exists there.
    if stream_key == dim_key:
        return stream.join(F.broadcast(dim), [stream_key], how)
    return stream.join(F.broadcast(dim), stream[stream_key] == dim[dim_key], how)
