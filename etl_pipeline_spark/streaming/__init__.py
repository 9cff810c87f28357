from etl_pipeline_spark.streaming.ingest import start_file_ingest  # noqa: F401
from etl_pipeline_spark.streaming.neardup import (  # noqa: F401
    streaming_neardup_flags,
)
from etl_pipeline_spark.streaming.windows import (  # noqa: F401
    sessionized_counts,
    sliding_value_stats,
    tumbling_counts,
)
