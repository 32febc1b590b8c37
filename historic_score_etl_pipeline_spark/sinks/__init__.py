from historic_score_etl_pipeline_spark.sinks.writer import ErrorChannel, retried_write

__all__ = ["ErrorChannel", "retried_write"]
