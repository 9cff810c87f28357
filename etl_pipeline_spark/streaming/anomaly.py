"""Streaming anomaly alerting against a precomputed seasonal baseline.

The batch side (queries/advanced.py:q_seasonal_hour_profile) publishes
the per-(event_type, hour-of-day) volume/value profile; this stream
scores each micro-batch's arrivals against that profile and sinks ALERT
rows whenever a cell's volume departs from its baseline by more than
``sigma`` Poisson standard deviations (sqrt(lambda) — the right scale
for count data). The monitoring loop every platform runs: baseline
refreshed daily by batch, scored continuously by the stream.

Exactly-once: alerts write to batch_id-keyed subdirectories (overwrite
on foreachBatch replay — the streaming/sketches.py pattern), so a crash
between write and checkpoint commit cannot duplicate alerts.

Scale: the baseline is a types x 24 table (broadcast); scoring is one
bounded aggregate per micro-batch. State lives in the checkpoint, not
the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

ALERT_SIGMA = 3.0


def seasonal_baseline(events: DataFrame) -> DataFrame:
    """Per-(event_type, hour) expected arrivals per observed day —
    the training side, run in batch over history."""
    days = events.select(F.to_date("ts").alias("d")).distinct().count()
    return (
        events.groupBy("event_type", F.hour("ts").alias("hour_of_day"))
        .agg(F.count("*").alias("n_total"))
        .select(
            "event_type",
            "hour_of_day",
            (F.col("n_total") / float(max(days, 1))).alias("expected_per_day"),
        )
    )


def start_anomaly_alerts(
    spark: SparkSession,
    input_dir: str,
    baseline: DataFrame,
    alert_dir: str,
    checkpoint_dir: str,
    sigma: float = ALERT_SIGMA,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for JSONL event files; per micro-batch, score
    (event_type, hour) arrival counts against ``baseline`` and write
    alert rows under ``alert_dir/batch_id=N/``."""
    raw = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).json(input_dir)
    b = F.broadcast(baseline)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        cells = batch_df.groupBy(
            "event_type", F.hour("ts").alias("hour_of_day")
        ).agg(F.count("*").alias("n_observed"))
        scored = (
            cells.join(b, ["event_type", "hour_of_day"], "left")
            .withColumn("expected", F.coalesce("expected_per_day", F.lit(0.0)))
            .withColumn(
                "z_poisson",
                (F.col("n_observed") - F.col("expected"))
                / F.sqrt(F.greatest(F.col("expected"), F.lit(1.0))),
            )
        )
        alerts = scored.filter(F.abs(F.col("z_poisson")) >= sigma).select(
            "event_type",
            "hour_of_day",
            "n_observed",
            F.round("expected", 2).alias("expected"),
            F.round("z_poisson", 2).alias("z_poisson"),
        )
        alerts.coalesce(1).write.mode("overwrite").parquet(
            f"{alert_dir}/batch_id={batch_id}"
        )

    writer = raw.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_alerts(spark: SparkSession, alert_dir: str) -> DataFrame:
    return spark.read.option("basePath", alert_dir).parquet(f"{alert_dir}/batch_id=*")
