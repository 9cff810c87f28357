from etl_pipeline_spark.queries.base import REGISTRY, QuerySpec, query  # noqa: F401
