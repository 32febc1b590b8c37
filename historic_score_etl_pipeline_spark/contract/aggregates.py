from historic_score_etl_pipeline_spark.contract import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
