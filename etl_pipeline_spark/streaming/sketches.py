"""Streaming sketch maintenance: a count-min counter grid kept current
over a file stream, exactly-once under micro-batch replay.

Counter grids ADD (operators/cms.py), so the streaming form writes each
micro-batch's counter DELTAS to a batch_id-keyed subdirectory — an
overwrite there is idempotent when foreachBatch re-delivers a batch
after a crash between write and checkpoint commit — and the merged view
is a plain sum over all delta files. No read-modify-write of global
state ever happens inside the hot path, which is what makes this safe
at any parallelism: the merge is associative, the replay unit is the
batch directory, and compaction of old deltas is an offline add.

The same layout IS the multi-day / multi-shard story at 100 TB: shard
grids by day or source, sum on read (DEPTH*WIDTH rows per shard —
trivial), compact when shard count grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_pipeline_spark.operators.cms import cms_increments


def start_cms_maintenance(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for text files (one document per line);
    maintain count-min counters of the word stream under
    ``state_dir/deltas/batch_id=N/``."""
    lines = spark.readStream.text(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        words = batch_df.select(
            F.explode(F.split(F.col("value"), " ")).alias("word")
        ).filter(F.col("word") != "")
        delta = cms_increments(words)
        (
            delta.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{state_dir}/deltas/batch_id={batch_id}")
        )

    writer = lines.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged counter grid: sum of all batch deltas (associative merge —
    order and replay count don't matter as long as each batch_id's
    directory holds exactly its final delta, which the overwrite
    guarantees)."""
    return (
        spark.read.option("basePath", f"{state_dir}/deltas")
        .parquet(f"{state_dir}/deltas/batch_id=*")
        .groupBy("d", "pos")
        .agg(F.sum("counter").alias("counter"))
    )
