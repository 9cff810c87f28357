"""Golden end-to-end ETL test (SURVEY.md §5.2): dirty COVID-shaped CSV
through parse -> validate -> cast -> filter -> split -> audit; asserts
final, quarantine and audit tables plus the conservation law."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.pipelines.covid import run_covid_pipeline

CSV = """entity,Day,total_confirmed_deaths
United States,2021-03-01,1500.7
France,2021-03-01,250
,2021-03-01,100
Germany,2021/03/01,50
Italy,2021-03-01,not-a-number
Spain,2021-03-01,0
Japan,2021-03-01,-5
Brazil,2021-03-02,300.2
"""


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("covid") / "covid.csv"
    p.write_text(CSV)
    return run_covid_pipeline(spark, str(p)), spark


def test_conservation_law(result):
    res, _ = result
    assert res.input_rows == 8
    assert res.output_rows + res.quarantined_rows + res.parse_failures == res.input_rows


def test_clean_rows(result):
    res, spark = result
    rows = {r["entity"]: r for r in spark.table("covid_clean").collect()}
    # 1500.7 -> 1500 (int(float(x)) truncation)
    assert set(rows) == {"United States", "France", "Brazil"}
    assert rows["United States"]["total_confirmed_deaths"] == 1500
    assert rows["Brazil"]["total_confirmed_deaths"] == 300
    assert str(rows["France"]["Day"]) == "2021-03-01"
    assert all(r["processed_timestamp"] is not None for r in rows.values())


def test_quarantine_reasons(result):
    res, spark = result
    reasons = {
        (r["entity"], r["reject_reason"]) for r in spark.table("covid_quarantine").collect()
    }
    assert (None, "missing_required_field") in reasons
    assert ("Germany", "invalid_date") in reasons
    assert ("Italy", "invalid_number") in reasons
    assert ("Spain", "non_positive_deaths") in reasons
    assert ("Japan", "non_positive_deaths") in reasons


def test_audit_row(result):
    res, spark = result
    audit = spark.table("covid_audit_log").collect()
    assert len(audit) == 1
    row = audit[0]
    assert row["file_name"] == "covid.csv"
    assert row["record_count"] == 3
    assert row["pipeline_status"] == "completed"
