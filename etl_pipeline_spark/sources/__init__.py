from etl_pipeline_spark.sources.readers import (  # noqa: F401
    read_csv_with_schema,
    read_json_records,
    read_jsonl,
    read_text_nonempty,
)
from etl_pipeline_spark.sources.sinks import (  # noqa: F401
    audit_record,
    write_with_audit,
)
