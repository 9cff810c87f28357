"""CLI entry point — SURVEY.md §3 Entry 1 parity: the reference's
``python dataflow_transform.py --input_file ... --output_table ...``
argparse surface, re-expressed as engine subcommands.

    python -m etl_pipeline_spark covid --input-csv data.csv \\
        --main-table covid_clean [--audit-table ...] [--quarantine-table ...]
    python -m etl_pipeline_spark food --input-csv food_daily.csv
    python -m etl_pipeline_spark ingest --input-glob 'landing/*.csv' \\
        --database etl
    python -m etl_pipeline_spark query q01_pricing_summary \\
        --sf-dir /root/testdata/sf0.001 [--show 20]
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="etl_pipeline_spark")
    sub = p.add_subparsers(dest="command", required=True)

    covid = sub.add_parser("covid", help="run the COVID CSV ETL pipeline")
    covid.add_argument("--input-csv", required=True)
    covid.add_argument("--main-table", default="covid_clean")
    covid.add_argument("--audit-table", default="covid_audit_log")
    covid.add_argument("--quarantine-table", default="covid_quarantine")

    food = sub.add_parser("food", help="run the food-orders pipeline")
    food.add_argument("--input-csv", required=True)

    ingest = sub.add_parser("ingest", help="validated multi-file ingest")
    ingest.add_argument("--input-glob", required=True)
    ingest.add_argument("--database", default="etl")

    qry = sub.add_parser("query", help="run a registered query by name")
    qry.add_argument("name")
    qry.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qry.add_argument("--show", type=int, default=20)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from etl_pipeline_spark.session import get_spark

    spark = get_spark(f"cli-{args.command}")
    if args.command == "covid":
        from etl_pipeline_spark.pipelines.covid import run_covid_pipeline

        res = run_covid_pipeline(
            spark,
            args.input_csv,
            main_table=args.main_table,
            audit_table=args.audit_table,
            quarantine_table=args.quarantine_table,
        )
        print(json.dumps(res.__dict__))
    elif args.command == "food":
        from etl_pipeline_spark.pipelines.food_orders import run_food_orders_pipeline

        res = run_food_orders_pipeline(spark, args.input_csv)
        print(json.dumps(res.__dict__))
    elif args.command == "ingest":
        from etl_pipeline_spark.pipelines.orchestration import run_validated_ingest

        res = run_validated_ingest(spark, args.input_glob, database=args.database)
        print(json.dumps(res.__dict__))
    elif args.command == "query":
        from etl_pipeline_spark.queries.base import all_specs

        specs = all_specs()
        if args.name not in specs:
            print(f"unknown query {args.name!r}; known: {sorted(specs)}", file=sys.stderr)
            return 2
        specs[args.name].fn(spark, args.sf_dir).show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
