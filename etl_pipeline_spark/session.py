"""SparkSession bootstrap tuned for the local[32] test harness.

At cluster scale the same settings hold: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), explicit shuffle-partition
sizing, Arrow enabled for the few Pandas-UDF code paths, UTC session
timezone so timestamp semantics match the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_pipeline_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Settings chosen for scale-readiness, not just local runs:
    - AQE + skew-join handling: runtime re-plan is the first line of
      defense against skewed keys at 100 TB.
    - ``spark.sql.shuffle.partitions`` matched to available parallelism
      locally; a real cluster would size this to ~2-3x total cores (or
      rely on AQE coalescing from a high initial value).
    - Arrow enabled so the Pandas-UDF slow paths batch via Arrow.
    - UTC timezone: deterministic timestamp semantics across engines.
    """
    n = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Some fixture parquet files carry TIMESTAMP(NANOS) (pandas ns
        # precision), which Spark rejects by default; read them as long
        # nanos and let the catalog convert losslessly to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
