"""Semantics-edge unit tests (SURVEY.md §5.3): F4 truncating cast, F7
six timestamp formats + rejects, strict-date parsing, presence checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.functions.cleaning import (
    clean_special_chars,
    multi_format_timestamp,
    non_empty,
    parse_strict_date,
    strip_trailing_colons,
    truncating_int_cast,
)


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r[0] for r in df.select(fn(F.col("x")).alias("y")).collect()]


def test_truncating_int_cast_matches_python_int_float(spark):
    # int(float(x)) semantics: truncate toward zero (dataflow_transform.py:45)
    got = _apply(spark, truncating_int_cast, ["3.99", "-2.7", "10", "0.5", "abc", "", None])
    assert got == [3, -2, 10, 0, None, None, None]


def test_parse_strict_date(spark):
    got = _apply(
        spark,
        parse_strict_date,
        ["2024-01-15", "2024-1-15", "2024/01/15", "2024-13-01", "not-a-date", None],
    )
    assert str(got[0]) == "2024-01-15"
    assert got[1:] == [None, None, None, None, None]


def test_multi_format_timestamp_accepts_all_six(spark):
    # The reference's five formats (dataflow.py:367-373, including
    # fraction-without-Z) plus the fraction+Z form its own emitter
    # produces (dataflow_transform.py:68) — accept set is a superset.
    vals = [
        "2024-01-15T10:30:00.123456Z",
        "2024-01-15T10:30:00.123456",
        "2024-01-15T10:30:00Z",
        "2024-01-15T10:30:00",
        "2024-01-15 10:30:00",
        "2024-01-15",
    ]
    got = _apply(spark, multi_format_timestamp, vals)
    assert all(g is not None for g in got)
    assert got[0].microsecond == 123456
    assert got[1].microsecond == 123456
    assert str(got[5]) == "2024-01-15 00:00:00"


def test_multi_format_timestamp_rejects(spark):
    got = _apply(spark, multi_format_timestamp, ["15/01/2024", "noon", ""])
    assert got == [None, None, None]


def test_non_empty_and_cleaning(spark):
    # FALSE AND NULL = FALSE in SQL logic, so a NULL input is plain False
    got = _apply(spark, lambda c: non_empty(c), ["x", "  ", "", None])
    assert got == [True, False, False, False]
    got = _apply(spark, strip_trailing_colons, ["abc::", "a:b", "abc"])
    assert got == ["abc", "a:b", "abc"]
    got = _apply(spark, clean_special_chars, ["he!!o w@rld", "a,b.c-d"])
    assert got == ["heo wrld", "a,b.c-d"]
