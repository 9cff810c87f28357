"""Multi-format source + validation gate tests (SURVEY.md S4-S6, Q1-Q4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_spark.quality.checks import (
    MissingColumnsError,
    file_gate,
    require_columns,
    validate_generic_records,
)
from etl_pipeline_spark.sources.readers import (
    read_json_records,
    read_jsonl,
    read_text_nonempty,
)


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sources")
    (d / "array.json").write_text(
        '[{"id": 1, "name": "a", "value": 10.5}, {"id": 2, "name": "b", "value": 0}]'
    )
    (d / "single.json").write_text('{"id": 3, "name": "c", "value": 7}')
    (d / "records.jsonl").write_text(
        '{"id": 4, "name": "d", "value": 1.5}\n'
        "this is not json\n"
        '{"id": 5, "name": "e", "value": 2.5}\n'
    )
    (d / "lines.txt").write_text("alpha\n\n   \nbeta\n")
    return d


def test_json_array_and_single_object(spark, datadir):
    arr = read_json_records(spark, str(datadir / "array.json"))
    assert arr.count() == 2
    single = read_json_records(spark, str(datadir / "single.json"))
    assert single.count() == 1
    assert {f.name for f in single.schema.fields} >= {"id", "name", "value"}


def test_jsonl_quarantines_bad_lines(spark, datadir):
    good, bad = read_jsonl(spark, str(datadir / "records.jsonl"))
    assert sorted(r["id"] for r in good.collect()) == [4, 5]
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["_corrupt_record"]


def test_text_nonempty(spark, datadir):
    lines = [r["value"] for r in read_text_nonempty(spark, str(datadir / "lines.txt")).collect()]
    assert lines == ["alpha", "beta"]


def test_require_columns(spark, datadir):
    df = read_json_records(spark, str(datadir / "array.json"))
    require_columns(df, ["id", "name", "value"])  # ok
    with pytest.raises(MissingColumnsError):
        require_columns(df, ["id", "entity"])


def test_validate_generic_records(spark):
    df = spark.createDataFrame(
        [
            ("1", "ok", "10.5", "2024-01-15T10:30:00Z"),
            ("", "noid", "1", None),
            ("3", "badval", "xx", None),
            ("4", "badts", "2", "not-a-time"),
        ],
        "id string, name string, value string, timestamp string",
    )
    checked = validate_generic_records(df)
    errs = {r["id"]: list(r["_errors"]) for r in checked.collect()}
    assert errs["1"] == []
    assert errs[""] == ["missing_id"]
    assert errs["3"] == ["value_not_numeric"]
    assert errs["4"] == ["bad_timestamp"]


def test_file_gate(spark, datadir):
    summary = file_gate(
        spark, [str(datadir / "array.json"), str(datadir / "single.json")], fmt="json"
    )
    assert summary.total_files == 2
    assert summary.total_records == 3
    assert summary.all_valid
