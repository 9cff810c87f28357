"""Streaming ingest — SURVEY.md §2.9: the reference's whole sensor-driven
DAG (GCS sensor -> validate -> transform -> load + audit, README.md:67-69,
airflow.py:47-54) as ONE Structured Streaming query.

The file source replaces the poll-every-60s sensor (S8) — new-file
discovery IS the trigger; ``cleanSource='archive'`` replaces the
move-to-processed lifecycle (S11); ``foreachBatch`` does the
transform + dual-sink load (S12/S13/S16) with exactly-once bookkeeping
via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_pipeline_spark.pipelines.covid import RAW_SCHEMA, transform_covid
from etl_pipeline_spark.sources.sinks import audit_record


def start_file_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for CSV arrivals; per micro-batch run the covid
    transform and write main/quarantine/audit parquet under ``output_dir``.

    ``availableNow`` processes the backlog then stops (batch-like test
    mode); drop it for a continuously-running ingest. At scale the same
    query runs unchanged on a cluster — state lives in the checkpoint.
    """
    reader = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("header", "true")
        .option("maxFilesPerTrigger", "16")
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    raw = reader.csv(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        clean, quarantine = transform_covid(batch_df)
        clean.write.mode("append").parquet(f"{output_dir}/main")
        quarantine.write.mode("append").parquet(f"{output_dir}/quarantine")
        n = clean.count()
        audit_record(spark, f"{input_dir} (batch {batch_id})", n).write.mode(
            "append"
        ).parquet(f"{output_dir}/audit")

    writer = raw.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def idempotent_batch_writer(output_dir: str, ledger_dir: str):
    """Wrap a foreachBatch body with a batch-id ledger so re-delivered
    micro-batches (restart after write-but-before-checkpoint) are skipped:
    exactly-once for non-transactional sinks.

    Spark's checkpoint guarantees each batch_id is re-delivered until
    committed; the ledger makes the WRITE side idempotent, closing the
    at-least-once gap for plain-parquet/append sinks.
    """
    import os

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.isdir(ledger_dir):
            seen = spark.read.parquet(ledger_dir)
            if seen.filter(seen.batch_id == batch_id).limit(1).count() > 0:
                return  # replay of an already-written batch
        batch_df.write.mode("append").parquet(output_dir)
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(ledger_dir)

    return process
