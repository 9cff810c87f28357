"""CLI dispatch (Entry-1 argparse parity) and the map-function family
(F17 map*)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_spark.__main__ import build_parser, main


def test_cli_parser_shapes():
    p = build_parser()
    a = p.parse_args(["covid", "--input-csv", "x.csv", "--main-table", "t"])
    assert a.command == "covid" and a.main_table == "t"
    a = p.parse_args(["query", "q01_pricing_summary", "--sf-dir", "/tmp/sf"])
    assert a.command == "query" and a.name == "q01_pricing_summary"
    with pytest.raises(SystemExit):
        p.parse_args(["covid"])  # missing required --input-csv


def test_cli_covid_dispatch(spark, tmp_path_factory, capsys):
    p = tmp_path_factory.mktemp("cli") / "c.csv"
    p.write_text("entity,Day,total_confirmed_deaths\nX,2021-01-01,5\n")
    rc = main(["covid", "--input-csv", str(p), "--main-table", "cli_covid_main",
               "--audit-table", "cli_covid_audit", "--quarantine-table", "cli_covid_q"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"output_rows": 1' in out
    assert spark.table("cli_covid_main").count() == 1


def test_cli_unknown_query(spark):
    assert main(["query", "no_such_query"]) == 2


def test_map_functions(spark):
    df = spark.createDataFrame([(1,)], "id int").select(
        "id",
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit(1), F.lit(2))
        ).alias("m"),
    )
    row = df.select(
        F.element_at("m", "b").alias("b_val"),
        F.map_keys("m").alias("keys"),
        F.map_values("m").alias("vals"),
        F.size("m").alias("n"),
        F.element_at(
            F.map_concat("m", F.create_map(F.lit("c"), F.lit(3))), "c"
        ).alias("c_val"),
    ).collect()[0]
    assert row["b_val"] == 2 and row["c_val"] == 3
    assert sorted(row["keys"]) == ["a", "b"] and sorted(row["vals"]) == [1, 2]
    assert row["n"] == 2
