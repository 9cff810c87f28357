"""Warehouse sinks + audit trail — SURVEY.md §2.1 (S12-S17), §2.11 (Q5).

The reference writes a main table (WRITE_TRUNCATE) and appends an audit
row per ingest (dataflow_transform.py:180-214). Spark equivalents:
``mode("overwrite")`` / ``mode("append")`` saveAsTable, plus a one-row
audit DataFrame synthesized from the load's own count — the multi-sink
fan-out (S16) reuses one cached DataFrame for both writes.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_SCHEMA = (
    "file_name string, ingestion_time timestamp, record_count long, "
    "input_path string, pipeline_status string, processed_timestamp timestamp"
)


def create_table_if_not_exists(spark: SparkSession, table: str, ddl_cols: str) -> None:
    """Idempotent DDL (S14 <- airflow.py:57-84 ``exists_ok=True``)."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols})")


def create_database_if_not_exists(spark: SparkSession, db: str) -> None:
    """Namespace DDL (S15 <- dataflow.py:452-460)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def overwrite_table(df: DataFrame, table: str) -> None:
    """Truncate-and-load sink (S12 <- dataflow_transform.py:180-189
    WRITE_TRUNCATE + CREATE_IF_NEEDED)."""
    df.write.mode("overwrite").saveAsTable(table)


def append_table(df: DataFrame, table: str) -> None:
    """Append sink (S13 <- dataflow_transform.py:205-214 WRITE_APPEND)."""
    df.write.mode("append").saveAsTable(table)


def audit_record(
    spark: SparkSession,
    input_path: str,
    record_count: int,
    status: str = "completed",
) -> DataFrame:
    """One-row audit entry (Q5 <- dataflow_transform.py:91-106): basename,
    ingestion time, the load's record count, full input path, status."""
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    row = [
        (
            os.path.basename(input_path),
            now,
            record_count,
            input_path,
            status,
            now,
        )
    ]
    return spark.createDataFrame(row, AUDIT_SCHEMA)


def write_with_audit(
    df: DataFrame,
    main_table: str,
    audit_table: str,
    input_path: str,
    mode: str = "overwrite",
) -> int:
    """Multi-sink fan-out (S16 <- dataflow_transform.py:166-214): one
    processed DataFrame feeds the main table and the audit log. The frame
    is cached so the audit count does not recompute the pipeline; at scale
    ``df.observe`` metrics could replace the extra count action entirely."""
    spark = df.sparkSession
    df = df.cache()
    df.write.mode(mode).saveAsTable(main_table)
    n = df.count()
    append_table(audit_record(spark, input_path, n), audit_table)
    df.unpersist()
    return n


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed table sink: co-locates future joins/aggs on the bucket key
    so they run with NO exchange (the 100 TB answer to repeated fact-fact
    joins — shuffle once at write time, never again at read time).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_with_observed_audit(
    df: DataFrame,
    main_table: str,
    audit_table: str,
    input_path: str,
    mode: str = "overwrite",
) -> int:
    """Single-pass variant of write_with_audit: the record count is
    captured by ``df.observe`` DURING the write (A3's accumulator pattern,
    SURVEY §2.4 <- CountRecords DoFn dataflow_transform.py:75-89), so the
    pipeline is executed exactly once — no cache, no second count job."""
    from pyspark.sql import Observation

    spark = df.sparkSession
    obs = Observation("load_metrics")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode(mode).saveAsTable(main_table)
    n = int(obs.get["n"])
    append_table(audit_record(spark, input_path, n), audit_table)
    return n


def compact_parquet(
    spark, path: str, target_file_mb: int = 128, partition_col: str | None = None
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~target_file_mb (the operational fix for streaming/append sinks that
    accumulate thousands of tiny files and throttle scan planning at
    scale). Returns the output file count.

    Sizing uses the current on-disk bytes; coalesce avoids a shuffle when
    shrinking the file count. Partitioned layouts are preserved.

    Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS during the
    swap — the two renames are not jointly atomic, so a reader hitting the
    path between them sees a missing directory. (An atomic swap needs a
    transactional table format; plain parquet directories only get
    single-rename atomicity.) A crash between the renames is recoverable:
    the data survives at ``<path>__old`` and :func:`recover_compaction`
    (also called on the next compact_parquet of the same path) restores
    it. The old copy is only deleted after the new path is verified
    readable.
    """
    import glob as globlib
    import os
    import shutil

    recover_compaction(path)
    files = [
        f
        for f in globlib.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    writer = df.coalesce(n_out).write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    old = path.rstrip("/") + "__old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    # verify the swapped-in copy is a readable parquet dataset before
    # destroying the old one; any failure here leaves __old for recovery
    spark.read.parquet(path).limit(1).collect()
    shutil.rmtree(old)
    return n_out


def recover_compaction(path: str) -> bool:
    """Crash recovery for :func:`compact_parquet`: if a previous run died
    between its two renames, the dataset lives at ``<path>__old`` and
    ``path`` is missing — move it back. Returns True if a restore
    happened. Leftover ``__compacting`` temp dirs are removed either way."""
    import os
    import shutil

    old = path.rstrip("/") + "__old"
    tmp = path.rstrip("/") + "__compacting"
    restored = False
    if os.path.isdir(old):
        if not os.path.isdir(path):
            # died between the renames: restore
            shutil.move(old, path)
            restored = True
        else:
            # died after the swap but before cleanup: new data is live
            shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    return restored


def upsert_parquet(
    spark, path: str, updates: DataFrame, key_cols: list[str]
) -> int:
    """Keyed upsert (MERGE) for a plain-parquet table: rows in ``updates``
    replace existing rows with the same key; all other existing rows are
    kept. Implemented as anti-join + union + atomic-as-possible rewrite
    (the same verified swap + crash recovery as compact_parquet — plain
    parquet has no transaction log, so the single-writer/no-reader window
    documented there applies).

    At scale the rewrite cost is bounded by partitioning the table on a
    key prefix and rewriting ONLY partitions containing updated keys (the
    pattern in operators/rollup_maintenance.py); this whole-table form is
    the portable fallback. Returns the resulting row count.
    """
    import os
    import shutil

    recover_compaction(path)
    updates = updates.localCheckpoint(eager=True)  # sever lineage from `path` reads
    if os.path.isdir(path):
        existing = spark.read.parquet(path)
        kept = existing.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    tmp = path.rstrip("/") + "__compacting"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        old = path.rstrip("/") + "__old"
        shutil.move(path, old)
        shutil.move(tmp, path)
        spark.read.parquet(path).limit(1).collect()
        shutil.rmtree(old)
    else:
        shutil.move(tmp, path)
    return spark.read.parquet(path).count()
