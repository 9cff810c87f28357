from etl_pipeline_spark.quality.checks import (  # noqa: F401
    FileGateError,
    MissingColumnsError,
    require_columns,
    validate_generic_records,
)
