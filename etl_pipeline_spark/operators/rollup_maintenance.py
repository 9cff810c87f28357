"""Incremental time-bucket rollups (hypertable-style continuous
aggregate) — the pattern that keeps a 100 TB event store queryable: a
pre-aggregated hourly table maintained incrementally as new events land,
refreshing ONLY the hour partitions the new data touches.

No table format with MERGE is assumed: the rollup is a Hive-partitioned
parquet table (partition column = hour bucket) refreshed with Spark's
dynamic partition overwrite — an idempotent, partition-granular upsert.

Scale: refresh cost is O(new data + touched partitions), never O(history);
readers prune to the hours they query (see the PartitionFilters test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "bucket_hour"


def hourly_rollup(events: DataFrame) -> DataFrame:
    """events(ts, event_type, value) -> per (hour, type) aggregate with a
    string partition column (stable directory names)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd-HH").alias(
                PARTITION_COL
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


def build_rollup(events: DataFrame, out_path: str) -> None:
    """Initial full build, partitioned by hour bucket."""
    hourly_rollup(events).write.mode("overwrite").partitionBy(PARTITION_COL).parquet(
        out_path
    )


def refresh_rollup(spark: SparkSession, all_events: DataFrame, new_events: DataFrame, out_path: str) -> list[str]:
    """Incremental refresh: recompute ONLY the hour buckets present in
    ``new_events`` (from the full event set for those hours, so late rows
    merge correctly) and overwrite just those partitions.

    Returns the refreshed bucket list. Uses dynamic partition overwrite so
    untouched history is never rewritten.
    """
    touched = [
        r[PARTITION_COL]
        for r in new_events.select(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd-HH").alias(
                PARTITION_COL
            )
        )
        .distinct()
        .collect()
    ]
    if not touched:
        return []
    affected = all_events.filter(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd-HH").isin(touched)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        hourly_rollup(affected).write.mode("overwrite").partitionBy(
            PARTITION_COL
        ).parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return sorted(touched)
