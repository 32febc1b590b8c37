"""Contract batch 17 — map higher-order functions and Arrow-native
Python UDFs.  Both ORACLE-CHECKED.

* ``hof_map_pipeline`` — MapType as a first-class processing shape:
  per-user totals collected into a map (``map_from_entries``), pruned
  with ``map_filter``, rescaled with ``transform_values``, exploded
  back to rows.  The whole map stage is one codegen'd projection after
  a single aggregation shuffle — maps never round-trip through Python.
  This is the typed form of the reference's dict-of-lists nested docs
  (``app/team_utilities.py:284-310``).
* ``udf_arrow_native`` — Spark 4 Arrow-optimized scalar Python UDF
  (``udf(..., useArrow=True)``): Python token counting at Arrow batch
  granularity instead of pickled rows.  Complements ``udf_classify``
  (pandas_udf): same hot-path rule — vectorized transfer or nothing.
  The plan assertion (ArrowEvalPython, tests/test_surface12.py) is the
  part the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- map higher-order pipeline ----------------------------------------------

_MIN_TOTAL = 100


def hof_map_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: event_type → decimal total as a map; keep entries whose
    total exceeds the threshold; double the kept values; explode back to
    (user_id, event_type, boosted) rows.  One shuffle (the per-user/type
    aggregate); every map operation is expression-level."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("tv")
    )
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "tv")))
        ).alias("m")
    )
    boosted = mapped.select(
        "user_id",
        F.transform_values(
            F.map_filter("m", lambda _, v: v > _MIN_TOTAL),
            lambda _, v: v * 2,
        ).alias("m2"),
    )
    return boosted.select(
        "user_id", F.explode("m2").alias("event_type", "boosted_dec")
    ).select(
        "user_id",
        "event_type",
        F.col("boosted_dec").cast("double").alias("boosted"),
    )


HOF_MAP_PIPELINE_SQL = f"""
SELECT user_id, event_type,
       CAST(sum(CAST(value AS DECIMAL(18,6))) * 2 AS DOUBLE) AS boosted
FROM events
GROUP BY 1, 2
HAVING sum(CAST(value AS DECIMAL(18,6))) > {_MIN_TOTAL}
"""


# --- Arrow-native Python UDF -------------------------------------------------


def _py_token_count(text: str | None) -> int:
    """Python's whitespace tokenization — split on any whitespace run,
    no empty tokens (str.split() semantics)."""
    return len(text.split()) if text else 0


def udf_arrow_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts per language computed by a Python function shipped
    over Arrow batches (useArrow=True): columnar transfer, no pickle
    loop.  At 100 TB this path is reserved for logic that genuinely
    needs Python; the expression library handles everything else."""
    tokens = F.udf(_py_token_count, "bigint", useArrow=True)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", tokens(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


UDF_ARROW_NATIVE_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(length(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                                   x -> x <> ''))) AS BIGINT) AS total_tokens,
       max(length(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                              x -> x <> ''))) AS max_tokens
FROM documents GROUP BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "hof_map_pipeline": QuerySpec(hof_map_pipeline, HOF_MAP_PIPELINE_SQL),
    "udf_arrow_native": QuerySpec(udf_arrow_native, UDF_ARROW_NATIVE_SQL),
}
