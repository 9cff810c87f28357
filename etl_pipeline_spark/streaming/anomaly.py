"""Streaming anomaly alerting against a precomputed seasonal baseline.

The batch side (queries/advanced.py:q_seasonal_hour_profile) publishes
the per-(event_type, hour-of-day) volume/value profile; this stream
scores each micro-batch's arrivals against that profile and sinks ALERT
rows whenever a cell's volume departs from its baseline by more than
``sigma`` Poisson standard deviations (sqrt(lambda) — the right scale
for count data). The monitoring loop every platform runs: baseline
refreshed daily by batch, scored continuously by the stream.

Scoring unit (r9 review): a cell is ONE (event_date, hour) slot of one
event_type — the same unit as the baseline's per-day-per-hour
expectation — so a multi-day availableNow backlog scores each day's
hour-10 separately instead of stacking them into one 3x-expected
false alarm. Outage detection (r9 review): every hour slot the batch's
timestamps TOUCH is scored against every baseline event_type, with
missing cells counted as zero — a producer that dies no longer
vanishes from the join; it shows up as z = -expected/sqrt(expected).
Caveat, documented rather than hidden: the batch's first/last touched
slots may be only partially covered by real wall-clock time, so their
volume-drop alerts are conservative noise; a watermark-closed variant
would score only complete slots.

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
        # malformed-row guard (r10 adversarial fuzz): corrupt feed lines
        # parse to all-null rows; without the filter a burst of garbage
        # accumulates in a NULL-(date, type) cell whose expected is 0 and
        # fires a phantom alert with NULL keys. An arrival without a
        # timestamp and type is not a scorable arrival.
        batch_df = batch_df.filter(
            F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        )
        # one cell = one (event_date, hour) slot (r9 review: grouping by
        # hour alone stacked every day of a backlog into one cell)
        cells = batch_df.groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("hour_of_day"),
            "event_type",
        ).agg(F.count("*").alias("n_observed"))
        # every hour slot the batch touches x every baseline event_type:
        # zero-arrival cells must be SCORED, not dropped (r9 review — a
        # dead producer is exactly the alert this monitor exists for)
        slots = batch_df.agg(
            F.date_trunc("hour", F.min("ts")).alias("mn"),
            F.date_trunc("hour", F.max("ts")).alias("mx"),
        ).select(
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("slot")
        ).select(
            F.to_date("slot").alias("event_date"),
            F.hour("slot").alias("hour_of_day"),
        )
        expected_cells = slots.join(
            b.select("event_type", "hour_of_day", "expected_per_day"),
            "hour_of_day",
        )
        scored = (
            expected_cells.join(
                cells, ["event_date", "hour_of_day", "event_type"], "full_outer"
            )
            .withColumn("n_observed", F.coalesce("n_observed", F.lit(0)))
            .withColumn("expected", F.coalesce("expected_per_day", F.lit(0.0)))
            .withColumn(
                "z_poisson",
                (F.col("n_observed") - F.col("expected"))
                / F.sqrt(F.greatest(F.col("expected"), F.lit(1.0))),
            )
        )
        alerts = scored.filter(F.abs(F.col("z_poisson")) >= sigma).select(
            "event_date",
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
