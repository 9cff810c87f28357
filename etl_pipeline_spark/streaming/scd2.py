"""Streaming SCD2 dimension maintenance — the continuous form of
q_scd2_user_values (queries/advanced.py): a file-source change feed is
folded into a type-2 dimension table per micro-batch with foreachBatch.

Incremental invariant: each batch recomputes validity intervals ONLY for
the keys it touches (their open rows are re-derived together with the new
changes via the same LEAD window), while rows of untouched keys are
carried over verbatim — so maintenance cost per batch is
O(batch + open rows of touched keys), never O(dimension history).

Crash safety / exactly-once: every batch publishes a full dimension
snapshot under ``dim_dir/v=<batch_id>/`` and then points the ``_LATEST``
marker at it. A crash mid-write leaves a partial version directory but
the marker still names the previous complete snapshot; Structured
Streaming replays the batch after restart, the partial directory is
overwritten (same deterministic content), and the marker moves exactly
once. Snapshots are derived purely from (previous snapshot, batch), so
replays are idempotent.

At 100 TB the snapshot-per-batch becomes a MERGE into a key-partitioned
table (or a format with transactional upsert); the per-batch plan — semi
join on touched keys, LEAD window over (open rows + changes), anti join
carry-over — is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _read_latest(spark: SparkSession, dim_dir: str, schema: str) -> DataFrame:
    marker = os.path.join(dim_dir, "_LATEST")
    if os.path.exists(marker):
        with open(marker) as fh:
            version = fh.read().strip()
        return spark.read.parquet(os.path.join(dim_dir, f"v={version}"))
    return spark.createDataFrame([], schema)


def _publish(df: DataFrame, dim_dir: str, batch_id: int) -> None:
    out = os.path.join(dim_dir, f"v={batch_id}")
    df.write.mode("overwrite").parquet(out)
    marker = os.path.join(dim_dir, "_LATEST")
    with open(marker + ".tmp", "w") as fh:
        fh.write(str(batch_id))
    os.replace(marker + ".tmp", marker)  # atomic on POSIX


DIM_SCHEMA = (
    "user_id BIGINT, valid_from TIMESTAMP, valid_to TIMESTAMP, "
    "value DOUBLE, is_current BOOLEAN"
)


def apply_scd2_batch(spark: SparkSession, dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold one batch of changes (user_id, ts, value) into the SCD2 table.

    Pure function of (dim, batch) — the unit the streaming writer and the
    tests share. Duplicate (user_id, ts) changes keep the highest value
    deterministically.
    """
    changes = (
        batch.select("user_id", "ts", "value")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    touched = changes.select("user_id").distinct()
    carried = dim.join(touched, "user_id", "left_anti")
    closed_touched = dim.filter(~F.col("is_current")).join(touched, "user_id", "left_semi")
    open_as_changes = (
        dim.filter(F.col("is_current"))
        .join(touched, "user_id", "left_semi")
        .select("user_id", F.col("valid_from").alias("ts"), "value")
    )
    merged = open_as_changes.unionByName(changes)
    w = W.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w)
    recomputed = merged.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        "value",
        nxt.isNull().alias("is_current"),
    )
    return carried.unionByName(closed_touched).unionByName(recomputed)


def start_scd2_maintenance(
    spark: SparkSession,
    input_dir: str,
    dim_dir: str,
    checkpoint_dir: str,
    schema: str = "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
):
    """Run the change feed at ``input_dir`` (json files) into an SCD2
    dimension at ``dim_dir``. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).json(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        dim = _read_latest(spark_b, dim_dir, DIM_SCHEMA)
        new_dim = apply_scd2_batch(spark_b, dim, batch_df)
        _publish(new_dim, dim_dir, batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
