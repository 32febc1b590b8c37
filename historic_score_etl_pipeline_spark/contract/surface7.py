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


# ORACLE (upgraded r5 from rows-only, VERDICT r4 ask #4): every output
# column — including both JSON-string boundaries — is a deterministic
# string the oracle rebuilds with plain concatenation, so the hash match
# covers the full three-hop enrichment byte-for-byte.  Spark's to_json
# emits no whitespace and preserves struct-field order, which the manual
# '{"Date":[...],...}' assembly mirrors (values are dates/links/flags —
# no JSON-escapable characters by construction).
PIPELINE_REFEREE_SQL = """
WITH fixtures AS (
  SELECT o_orderkey AS fixture_key, o_custkey AS ref_key,
         CAST(o_orderdate AS VARCHAR) AS date,
         strftime(CAST(o_orderdate AS TIMESTAMP), '%H:%M') AS time,
         'team_' || CAST(o_orderkey % 100 AS VARCHAR) AS hometeam,
         'team_' || CAST((o_orderkey + 1) % 100 AS VARCHAR) AS awayteam,
         o_orderstatus AS result,
         'match/' || CAST(o_orderkey AS VARCHAR) AS matchlink,
         o_orderpriority AS league
  FROM orders
  WHERE o_orderdate >= DATE '1997-01-01'
    AND o_orderdate < DATE '1997-01-01' + INTERVAL 60 DAY
), hist AS (
  SELECT o_custkey AS ref_key, min(o_orderkey) AS hist_okey
  FROM orders GROUP BY o_custkey
), li AS (
  -- mirror the Spark detail struct EXACTLY, incl. the NTZ timestamp
  -- string form of l_shipdate; the sort below replays array_sort's
  -- full struct-lexicographic order (l_linenumber is NOT unique in the
  -- synthetic data, so every field participates in the tiebreak)
  SELECT l_orderkey,
         l_linenumber AS ln,
         CAST(CAST(l_shipdate AS TIMESTAMP) AS VARCHAR) AS d,
         'T' || CAST(l_partkey AS VARCHAR) AS home,
         'T' || CAST(l_suppkey AS VARCHAR) AS away,
         CAST(CAST(floor(l_quantity) AS INTEGER) AS VARCHAR)
           || ':' || CAST(l_linenumber AS VARCHAR) AS score,
         l_returnflag AS yellow,
         l_linestatus AS unkown,
         CASE WHEN l_discount > 0.05 THEN '1' ELSE '0' END AS red
  FROM lineitem
), det AS (
  SELECT l_orderkey AS hist_okey,
         '{"Date":['
           || string_agg('"' || d || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Home Team":['
           || string_agg('"' || home || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Away Team":['
           || string_agg('"' || away || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Score":['
           || string_agg('"' || score || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Yellow Cards":['
           || string_agg('"' || yellow || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Unkown Card":['
           || string_agg('"' || unkown || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || '],"Red Cards":['
           || string_agg('"' || red || '"', ','
                         ORDER BY ln, d, home, away, score, yellow,
                                  unkown, red)
           || ']}' AS detail_json
  FROM li GROUP BY l_orderkey
)
SELECT f.date, f.time, f.hometeam, f.awayteam, f.result, f.matchlink,
       f.league,
       coalesce('ref/' || CAST(c.c_custkey AS VARCHAR), '') AS refereelink,
       coalesce('{"1":["hist/' || CAST(h.hist_okey AS VARCHAR) || '"]}',
                '{}') AS referee_matchistlink,
       coalesce(d.detail_json, '{}') AS referee_matchhistdetails
FROM fixtures f
LEFT JOIN customer c ON c.c_custkey = f.ref_key
LEFT JOIN hist h ON h.ref_key = f.ref_key
LEFT JOIN det d ON d.hist_okey = h.hist_okey
"""


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
    "pipeline_referee": QuerySpec(pipeline_referee, PIPELINE_REFEREE_SQL),
    "agg_hll_mergeable": QuerySpec(agg_hll_mergeable, None),
    "matview_incremental": QuerySpec(matview_incremental, MATVIEW_INCREMENTAL_SQL),
}
