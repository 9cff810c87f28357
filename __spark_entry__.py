"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``etl_pipeline_spark.queries`` — every operator from
SURVEY.md §2 registers a named query (Spark callable) plus, where
SQL-expressible, the equivalent DuckDB oracle SQL. The driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against ``oracle_sql()[name]``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-style
    pricing summary (scan -> filter -> grouped multi-aggregate)."""
    from etl_pipeline_spark.queries.base import all_specs

    return all_specs()["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_pipeline_spark.queries.base import all_specs

    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted for
    engine-specific ops (MinHash/LSH hash families) which get the driver's
    rows-only check, with an exact oracle-checked counterpart registered
    alongside (e.g. q_dedup_ngram_jaccard verifies q_dedup_minhash_lsh)."""
    from etl_pipeline_spark.queries.base import all_specs

    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
