from historic_score_etl_pipeline_spark.plans.flagship import flagship_pipeline

__all__ = ["flagship_pipeline"]
