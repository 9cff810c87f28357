from etl_pipeline_spark.pipelines.covid import run_covid_pipeline, transform_covid  # noqa: F401
from etl_pipeline_spark.pipelines.food_orders import run_food_orders_pipeline  # noqa: F401
