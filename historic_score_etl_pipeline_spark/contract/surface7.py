"""Contract batch 12 — second end-to-end pipeline, mergeable-sketch
rollups, and incremental materialized-view maintenance.

* ``pipeline_referee`` — the reference's OTHER entry point
  (``app/ref_utilities.py:52-245``): three-hop enrichment into the
  ``ref_historic_match`` output shape, JSON only at the boundary.
  Rows-only: the output's JSON-string columns are engine-formatted
  (shape parity is unit-tested in tests/test_referee_pipeline.py).
* ``agg_hll_mergeable`` — per-(day, event_type) HLL sketches rolled up
  to per-type distinct-user estimates by sketch UNION, no raw rescan.
  Rows-only: HLL estimates are engine-specific (the sketch-union ≡
  direct-sketch identity and accuracy bounds are unit-tested).
* ``matview_incremental`` — daily-counts state split at Jan 15, delta
  folded in via ``merge_state``; ORACLE-CHECKED against the full
  recompute, proving the fold is exact, not approximately right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.incremental import (
    merge_state,
    partial_aggregate,
)
from historic_score_etl_pipeline_spark.operators.sketches import (
    build_sketches,
    rollup_estimate,
)
from historic_score_etl_pipeline_spark.plans.referee import referee_pipeline
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def pipeline_referee(spark: SparkSession, sf_dir: str) -> DataFrame:
    return referee_pipeline(spark, sf_dir)


def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store daily per-type sketches once; answer the per-type distinct
    question from the sketches alone."""
    ev = load_table(spark, sf_dir, "events")
    daily = build_sketches(
        ev.withColumn("day", F.col("ts").cast("date")),
        ["day", "event_type"],
        "user_id",
    )
    return rollup_estimate(daily, ["event_type"]).orderBy("event_type")


_SPLIT = "2024-01-15"

_MEASURES = {
    "n_events": ("count", "event_id"),
    "sum_value": ("sum", "value_dec"),
    "max_value": ("max", "value_dec"),
}


def matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State = aggregate of events before Jan 15; delta = the rest.
    merge_state(state, partial(delta)) must equal the full recompute —
    the oracle IS the full recompute."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    keys = ["day", "event_type"]
    state = partial_aggregate(
        ev.where(F.col("day") < F.lit(_SPLIT).cast("date")), keys, _MEASURES
    )
    delta = ev.where(F.col("day") >= F.lit(_SPLIT).cast("date"))
    updated = merge_state(state, partial_aggregate(delta, keys, _MEASURES), keys, _MEASURES)
    return updated.select(
        F.col("day").cast("string").alias("day"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


MATVIEW_INCREMENTAL_SQL = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       event_type,
       count(event_id) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_referee": QuerySpec(pipeline_referee, None),
    "agg_hll_mergeable": QuerySpec(agg_hll_mergeable, None),
    "matview_incremental": QuerySpec(matview_incremental, MATVIEW_INCREMENTAL_SQL),
}
