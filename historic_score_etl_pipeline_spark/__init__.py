"""historic_score_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query / data-processing
capabilities of the reference ETL pipeline (``wedcorrect/Historic-Score-ETL-
Pipeline``, surveyed in ``SURVEY.md``), plus the LLM-data-pipeline operator
set (dedup, similarity search, multimodal columns, text analysis) required by
the north star — every operator designed for 100 TB scale.

Design principles (see SURVEY.md §4.2):

* Declare logical plans with the DataFrame/SQL API; let Catalyst + AQE pick
  physical strategies.  Zero custom Catalyst rules.
* Built-in ``pyspark.sql.functions`` everywhere; Arrow-batched Pandas UDFs
  only where built-ins genuinely cannot express the semantics (MinHash,
  multimodal decode).
* Broadcast small dimensions, pre-bucket big fact tables for repeated join
  keys, sort-within-group for deterministic collect_list.
* Queries never depend on session configuration (explicit ``try_cast``,
  explicit orderings, explicit rounding) so they run identically under any
  SparkSession the caller provides.
"""

from historic_score_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
