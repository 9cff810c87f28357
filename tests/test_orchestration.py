"""Entry-3 orchestration: distributed validation gate -> namespace DDL ->
pipeline -> count reconciliation (Q1/Q7/S15)."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.pipelines.orchestration import run_validated_ingest
from etl_pipeline_spark.quality.checks import FileGateError

GOOD = """entity,Day,total_confirmed_deaths
A,2021-01-01,10
B,2021-01-01,20
"""
MORE = """entity,Day,total_confirmed_deaths
C,2021-01-02,30
bad-row,not-a-date,xx
"""


def test_validated_ingest_end_to_end(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    (d / "a.csv").write_text(GOOD)
    (d / "b.csv").write_text(MORE)
    res = run_validated_ingest(spark, str(d / "*.csv"), database="etl_t1")
    assert res.input_rows == 4
    assert res.output_rows == 3
    assert res.quarantined_rows == 1
    assert spark.table("etl_t1.covid_clean").count() == 3
    assert spark.table("etl_t1.covid_quarantine").count() == 1
    assert spark.table("etl_t1.covid_audit_log").count() == 1


def test_gate_blocks_empty_fileset(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest_empty")
    with pytest.raises(FileGateError):
        run_validated_ingest(spark, str(d / "*.csv"))


def test_archive_to_processed_moves_once_idempotent(spark, tmp_path_factory):
    """S11 batch path: after a successful validated ingest with
    archive=True, inputs live under processed/ exactly once; re-running
    the archive step (crash-retry shape) moves nothing and errors
    nothing."""
    import os

    from etl_pipeline_spark.pipelines.orchestration import archive_to_processed

    d = tmp_path_factory.mktemp("ingest_arch")
    (d / "a.csv").write_text(GOOD)
    (d / "b.csv").write_text(MORE)
    res = run_validated_ingest(
        spark, str(d / "*.csv"), database="etl_t_arch", archive=True
    )
    assert res.output_rows == 3
    assert not os.path.exists(d / "a.csv") and not os.path.exists(d / "b.csv")
    assert sorted(os.listdir(d / "processed")) == ["a.csv", "b.csv"]
    # idempotent rerun: sources gone, destinations present -> no-op
    assert archive_to_processed([str(d / "a.csv"), str(d / "b.csv")]) == []
    assert sorted(os.listdir(d / "processed")) == ["a.csv", "b.csv"]
    # partial-crash shape: one file restored, its twin already archived ->
    # only the restored one moves, the archive copy is never clobbered
    (d / "a.csv").write_text(GOOD)
    moved = archive_to_processed([str(d / "a.csv"), str(d / "b.csv")])
    assert moved == []  # dest exists: keep the archive copy, skip
    assert os.path.exists(d / "a.csv")
