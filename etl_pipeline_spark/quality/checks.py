"""Data-quality gates — SURVEY.md §2.11 (Q1-Q7).

The reference's distinctive surface: per-file validation before any load
(dataflow.py:62-384). Re-expressed so the checks run distributed (Spark
jobs over the files) instead of downloading every file into one worker
(the reference's hotspot, dataflow.py:184).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.functions.cleaning import (
    multi_format_timestamp,
    non_empty,
    parse_double_or_null,
)


class MissingColumnsError(ValueError):
    """Raised when a required column is absent (Q3 <- dataflow.py:247-250)."""


class FileGateError(ValueError):
    """Raised when the file-set gate fails (Q1 <- dataflow.py:62-134)."""


def require_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Fail fast if required columns are missing (Q3). Returns df for
    chaining."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise MissingColumnsError(f"missing required columns: {missing}")
    return df


def validate_generic_records(df: DataFrame) -> DataFrame:
    """Record-structure check (Q4 <- validate_record_structure,
    dataflow.py:296-325): required fields id/name/value non-empty (0
    allowed for value), value numeric, optional timestamp in one of the 5
    accepted formats. Adds an ``_errors`` array column — empty means valid
    — so callers can quarantine instead of raise (Q6 upgrade)."""
    errors = F.array_compact(
        F.array(
            F.when(~non_empty(F.col("id").cast("string")), F.lit("missing_id")),
            F.when(~non_empty(F.col("name").cast("string")), F.lit("missing_name")),
            F.when(F.col("value").cast("string").isNull(), F.lit("missing_value")).otherwise(
                F.when(
                    parse_double_or_null(F.col("value").cast("string")).isNull(),
                    F.lit("value_not_numeric"),
                )
            ),
            F.when(
                F.col("timestamp").isNotNull()
                & multi_format_timestamp(F.col("timestamp")).isNull(),
                F.lit("bad_timestamp"),
            )
            if "timestamp" in df.columns
            else F.lit(None).cast("string"),
        )
    )
    return df.withColumn("_errors", errors)


@dataclass
class FileValidationSummary:
    """Q1/Q7 contract: what prepare_dataflow_parameters consumed
    (dataflow.py:387-416)."""

    total_files: int
    valid_files: int
    total_records: int
    per_file: dict[str, int] = field(default_factory=dict)
    errors: list[str] = field(default_factory=list)

    @property
    def all_valid(self) -> bool:
        return self.valid_files == self.total_files and self.total_records > 0


def file_gate(
    spark: SparkSession, paths: list[str], fmt: str = "json", min_records: int = 1
) -> FileValidationSummary:
    """File-set validation gate (Q1 <- check_input_files, dataflow.py:62-134):
    count records per file distributed (input_file_name groupBy — one Spark
    job for the whole file set, vs the reference's sequential downloads),
    fail when any file is empty or the total is below ``min_records``.
    """
    if not paths:
        raise FileGateError("no input files")
    if fmt == "json":
        df = spark.read.option("multiLine", "true").json(paths)
    elif fmt == "jsonl":
        df = spark.read.json(paths)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(paths)
    elif fmt == "text":
        df = spark.read.text(paths).filter(F.length(F.trim(F.col("value"))) > 0)
    else:
        raise FileGateError(f"unsupported format: {fmt}")
    counts = {
        r["file"]: r["cnt"]
        for r in df.groupBy(F.input_file_name().alias("file"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    errors = []
    # A file missing from the groupBy produced zero records.
    seen_total = sum(counts.values())
    matched = set()
    for p in paths:
        hits = [f for f in counts if f.endswith(p.rsplit("/", 1)[-1])]
        if not hits:
            errors.append(f"{p}: no records")
        else:
            matched.update(hits)
    summary = FileValidationSummary(
        total_files=len(paths),
        valid_files=len(paths) - sum(1 for e in errors if e.endswith("no records")),
        total_records=seen_total,
        per_file=counts,
        errors=errors,
    )
    if seen_total < min_records:
        summary.errors.append(f"total records {seen_total} < {min_records}")
    return summary
