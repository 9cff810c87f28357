"""Data-quality gates — SURVEY.md §2.11 (Q1-Q7).

The reference's distinctive surface: per-file validation before any load
(dataflow.py:62-384). Re-expressed so the checks run distributed (Spark
jobs over the files) instead of downloading every file into one worker
(the reference's hotspot, dataflow.py:184).
"""

from __future__ import annotations

import datetime as _dt
import operator
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
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
    chaining. Membership follows Spark's own resolution rules — with
    the default spark.sql.caseSensitive=false a frame column `Entity`
    satisfies a required `entity` (r9 review: the case-sensitive test
    hard-failed loads every downstream reference would resolve fine)."""
    case_sensitive = (
        str(
            df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
        ).lower()
        == "true"
    )
    have = set(df.columns) if case_sensitive else {c.lower() for c in df.columns}
    missing = [
        c for c in required if (c if case_sensitive else c.lower()) not in have
    ]
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

    @property
    def warnings(self) -> list[str]:
        """S10 threshold findings — advisory, never invalidate the set
        (the reference logs and continues, dataflow.py:174-180)."""
        return [e for e in self.errors if e.startswith("warning: ")]


LARGE_FILE_MB = 100.0
OLD_FILE_DAYS = 7

# per_file dicts above this cardinality stay empty: the verdict math is
# distributed, so the driver only ever holds error rows + one summary row
PER_FILE_COLLECT_CAP = 10_000
# hard errors collected to the driver are capped too (a gate over a
# million empty files should report "a lot", not OOM the driver)
ERROR_COLLECT_CAP = 1_000


def _strip_scheme(col: Column) -> Column:
    """Normalize a file URI to a bare absolute path so Spark's
    ``file:/...`` listings compare equal to caller-supplied ``/...``
    paths. Basename comparison is NOT enough: a/data.json and
    b/data.json must stay distinct (empty-file masking otherwise)."""
    return F.regexp_replace(F.regexp_replace(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*:", ""), r"^/+", "/")


def probe_file_metadata(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed file-metadata probe (S10 <- dataflow.py:154-167): path,
    size (bytes and MB — F13's unit conversion, dataflow.py:165), and
    modification time per file, WITHOUT reading file contents — the
    binaryFile source prunes its ``content`` column when only metadata
    columns are selected, so this stays a listing-only job even over a
    100 TB prefix."""
    return (
        spark.read.format("binaryFile")
        .load(paths)
        .select(
            F.col("path"),
            F.col("length").alias("size_bytes"),
            (F.col("length") / F.lit(1024.0 * 1024.0)).alias("size_mb"),
            F.col("modificationTime").alias("mtime"),
        )
    )


def file_metadata_checks(
    spark: SparkSession,
    paths: list[str],
    max_size_mb: float = LARGE_FILE_MB,
    max_age_days: int = OLD_FILE_DAYS,
    now: _dt.datetime | None = None,
) -> list[str]:
    """Threshold probes over file metadata (S10 <- dataflow.py:169-180):
    empty files are hard errors; files larger than ``max_size_mb`` or older
    than ``max_age_days`` produce ``warning:``-prefixed entries — same
    keep-going semantics as the reference's ``logging.warning``. The checks
    aggregate executor-side; only the flagged rows reach the driver."""
    now = now or _dt.datetime.now(_dt.timezone.utc)
    meta = probe_file_metadata(spark, paths).withColumn(
        "norm_path", _strip_scheme(F.col("path"))
    )
    age_days = (F.lit(now) - F.col("mtime")).cast("long") / F.lit(86400.0)
    flagged = (
        meta.select("path", "size_mb", "size_bytes", age_days.alias("age_days"))
        .filter((F.col("size_mb") > max_size_mb) | (F.col("age_days") > max_age_days))
        .limit(ERROR_COLLECT_CAP)
        .collect()
    )
    # The binaryFile source omits 0-byte files from its listing, so "empty"
    # is detected as input paths absent from the probe (dataflow.py:170-171
    # raises on 0 bytes; here it's a hard error entry). The comparison is on
    # scheme-normalized FULL paths via a distributed anti-join — basename
    # matching would let any same-named non-empty file mask an empty one,
    # and collecting the whole listing would put every path on the driver.
    paths_df = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).withColumn("norm_path", _strip_scheme(F.col("path")))
    missing = (
        paths_df.join(meta.select("norm_path"), "norm_path", "left_anti")
        .select("path")
        .limit(ERROR_COLLECT_CAP)
        .collect()
    )
    findings: list[str] = []
    for r in missing:
        findings.append(f"{r['path']}: empty file (0 bytes)")
    for r in flagged:
        if r["size_mb"] > max_size_mb:
            findings.append(f"warning: {r['path']}: large file {r['size_mb']:.2f} MB")
        if r["age_days"] > max_age_days:
            findings.append(f"warning: {r['path']}: old file {int(r['age_days'])} days")
    return findings


def format_for_path(path: str) -> str:
    """Extension -> format dispatch (Q2 <- dataflow.py:189-199): json, csv,
    jsonl/ndjson, anything else plain text."""
    name = path.rsplit("/", 1)[-1].lower()
    ext = name.rsplit(".", 1)[-1] if "." in name else ""
    if ext == "json":
        return "json"
    if ext == "csv":
        return "csv"
    if ext in ("jsonl", "ndjson"):
        return "jsonl"
    return "text"


def file_gate(
    spark: SparkSession,
    paths: list[str],
    fmt: str | None = "json",
    min_records: int = 1,
    check_metadata: bool = False,
) -> FileValidationSummary:
    """File-set validation gate (Q1 <- check_input_files, dataflow.py:62-134):
    count records per file distributed (input_file_name groupBy — one Spark
    job for the whole file set, vs the reference's sequential downloads),
    fail when any file is empty or the total is below ``min_records``.

    ``fmt=None`` routes each file by extension (Q2 <- dataflow.py:189-199),
    handling mixed-format directories by running one gate per format group
    and merging the summaries. ``check_metadata=True`` adds the S10
    size/age threshold probes to the summary's errors list.
    """
    if not paths:
        raise FileGateError("no input files")
    if fmt is None:
        groups: dict[str, list[str]] = {}
        for p in paths:
            groups.setdefault(format_for_path(p), []).append(p)
        merged = FileValidationSummary(0, 0, 0)
        for gfmt, gpaths in sorted(groups.items()):
            part = file_gate(spark, gpaths, fmt=gfmt, min_records=0)
            merged.total_files += part.total_files
            merged.valid_files += part.valid_files
            merged.total_records += part.total_records
            merged.per_file.update(part.per_file)
            merged.errors.extend(part.errors)
        if merged.total_records < min_records:
            merged.errors.append(f"total records {merged.total_records} < {min_records}")
        if check_metadata:
            merged.errors.extend(file_metadata_checks(spark, paths))
        return merged
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
    # Distributed verdict: per-file counts stay a DataFrame; the driver
    # receives ONE summary row plus at most ERROR_COLLECT_CAP error rows.
    # Input paths join the counts on scheme-normalized FULL paths (never
    # basenames — two dirs may share filenames), left outer so a file the
    # reader produced zero records for surfaces as cnt NULL.
    # corrupt/unparseable rows must not count as records (r9 review: a
    # truncated JSON file parsed to one _corrupt_record-only row and
    # PASSED the gate). Validity derives from the PAYLOAD columns (any
    # non-null field), never from _corrupt_record: referencing only the
    # corrupt column on a raw read is refused by Spark, and the cache
    # workaround breaks input_file_name() (empty on InMemoryRelation) —
    # a corrupt row has every payload field null, so the tests agree.
    payload = [c for c in df.columns if c != "_corrupt_record"]
    if "_corrupt_record" in df.columns:
        # "any non-null payload field" must be an OR over every column:
        # isNotNull never returns NULL, so a coalesce() chain would collapse
        # to the FIRST column's test alone and reject healthy rows whose
        # first (for JSON: alphabetically first) field is legitimately null.
        valid_row = (
            reduce(operator.or_, [F.col(c).isNotNull() for c in payload])
            if payload
            else F.lit(False)
        )
    else:
        valid_row = F.lit(True)
    # nullif(0): a file whose rows are ALL corrupt must look exactly like
    # a no-records file to the NULL-keyed validity logic below
    counts_df = df.groupBy(
        _strip_scheme(F.input_file_name()).alias("norm_path")
    ).agg(F.nullif(F.sum(valid_row.cast("long")), F.lit(0)).alias("cnt"))
    paths_df = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).withColumn("norm_path", _strip_scheme(F.col("path")))
    joined = paths_df.join(counts_df, "norm_path", "left").localCheckpoint(eager=True)
    totals = joined.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("total_records"),
        F.count(F.lit(1)).alias("total_files"),
        F.count("cnt").alias("valid_files"),
    ).collect()[0]
    errors = [
        f"{r['path']}: no records"
        for r in joined.filter(F.col("cnt").isNull())
        .select("path")
        .limit(ERROR_COLLECT_CAP)
        .collect()
    ]
    per_file: dict[str, int] = {}
    if len(paths) <= PER_FILE_COLLECT_CAP:
        per_file = {
            r["path"]: r["cnt"]
            for r in joined.filter(F.col("cnt").isNotNull()).collect()
        }
    summary = FileValidationSummary(
        total_files=int(totals["total_files"]),
        valid_files=int(totals["valid_files"]),
        total_records=int(totals["total_records"]),
        per_file=per_file,
        errors=errors,
    )
    if summary.total_records < min_records:
        summary.errors.append(
            f"total records {summary.total_records} < {min_records}"
        )
    if check_metadata:
        summary.errors.extend(file_metadata_checks(spark, paths))
    return summary
