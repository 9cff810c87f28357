from etl_pipeline_spark.functions.cleaning import (  # noqa: F401
    basename,
    clean_special_chars,
    multi_format_timestamp,
    non_empty,
    parse_double_or_null,
    parse_strict_date,
    strip_trailing_colons,
    truncating_int_cast,
    utc_now_iso,
)
