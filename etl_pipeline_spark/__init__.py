"""etl_pipeline_spark — a PySpark-native ETL & analytics engine.

Brand-new engine with the data-processing capabilities of the reference
GCP ETL project (CSV/JSON landing → validation → clean/type → filtered,
audited warehouse loads) re-expressed Spark-first, plus the relational
surface the reference delegated to BigQuery SQL and the LLM-data-pipeline
extension operators (dedup, similarity search, text analysis, multimodal
columns). See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
