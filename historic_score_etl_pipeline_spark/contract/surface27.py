"""Round-4 batch 34 (final lean batch) — three everyday analytics
functions completing the expression surface:

* ``agg_min_max_by`` — ``max_by`` / ``min_by`` (the value of column A
  at the extremum of column B): the lookup-at-extremum aggregate that
  replaces a self-join-on-groupwise-max.  Ties are impossible by
  construction: the ordering key is a zero-padded (ts, event_id)
  string — lexicographic order == (ts, event_id) order, identical in
  both engines.
* ``window_pct_change`` — percent change vs the previous observation
  per user (lag ratio): THE time-series delta.  Ratio of exact cents
  BIGINTs rounded once; first observation yields NULL.
* ``str_regexp_extract_all`` — ``regexp_extract_all`` + explode: pull
  every numeric run out of the JSON-ish props payload and aggregate —
  the multi-match cousin of the single-match extraction the reference
  does on hrefs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- max_by / min_by ----------------------------------------------------------


def _ord_key() -> Column:
    """Unique, engine-portable ordering key: zero-padded micros then
    event id — lexicographic == numeric (ts, event_id)."""
    return F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, type): the event value at the LATEST and EARLIEST
    occurrence — one map-side-combined shuffle, no join, no window.
    The groupwise-extremum lookup that naive SQL writes as a self-join
    on (key, max(ts)) — twice the scan, one more shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "user_id", "event_type", cents.alias("cents"), _ord_key().alias("ok")
    )
    return base.groupBy("user_id", "event_type").agg(
        F.max_by("cents", "ok").alias("latest_cents"),
        F.min_by("cents", "ok").alias("earliest_cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


AGG_MIN_MAX_BY_SQL = """
WITH base AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
  FROM events
)
SELECT user_id, event_type,
       arg_max(cents, ok) AS latest_cents,
       arg_min(cents, ok) AS earliest_cents,
       CAST(count(*) AS BIGINT) AS n
FROM base GROUP BY user_id, event_type
"""


# --- percent change -----------------------------------------------------------


def window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent change vs the previous event's value per user: lag over
    one user shuffle; the ratio divides exact cents BIGINTs (identical
    IEEE division both engines) and rounds once.  First event per user
    → NULL (no prior)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"), cents.alias("cents"),
        )
        .select(
            "event_id",
            "user_id",
            "cents",
            F.lag("cents").over(
                Window.partitionBy("user_id").orderBy("ts_us", "event_id")
            ).alias("prev_cents"),
        )
        .select(
            "event_id",
            "user_id",
            "cents",
            "prev_cents",
            F.when(
                F.col("prev_cents").isNotNull() & (F.col("prev_cents") != 0),
                F.round(
                    (F.col("cents") - F.col("prev_cents")).cast("double")
                    * 100.0
                    / F.col("prev_cents").cast("double"),
                    6,
                ),
            ).alias("pct_change_r6"),
        )
    )


WINDOW_PCT_CHANGE_SQL = """
WITH base AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_cents
  FROM events
)
SELECT event_id, user_id, cents, prev_cents,
       CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
            THEN round(CAST(cents - prev_cents AS DOUBLE) * 100.0
                       / CAST(prev_cents AS DOUBLE), 6)
       END AS pct_change_r6
FROM base
"""


# --- regexp_extract_all -------------------------------------------------------


def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every digit run in the props payload (multi-match extraction),
    exploded and rolled up: count, distinct values, integer sum per
    event type.  The multi-match cousin of the reference's single
    href extraction — scan-side regex, one aggregate shuffle."""
    ev = load_table(spark, sf_dir, "events")
    nums = F.regexp_extract_all(F.col("props"), F.lit(r"[0-9]+"), 0)
    return (
        ev.select("event_type", F.explode(nums).alias("num"))
        .select("event_type", F.col("num").cast("long").alias("n"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.countDistinct("n").cast("long").alias("n_distinct"),
            F.sum("n").cast("long").alias("total"),
        )
    )


STR_REGEXP_EXTRACT_ALL_SQL = """
WITH nums AS (
  SELECT event_type,
         CAST(unnest(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT n) AS BIGINT) AS n_distinct,
       CAST(sum(n) AS BIGINT) AS total
FROM nums GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_min_max_by": QuerySpec(agg_min_max_by, AGG_MIN_MAX_BY_SQL),
    "window_pct_change": QuerySpec(window_pct_change, WINDOW_PCT_CHANGE_SQL),
    "str_regexp_extract_all": QuerySpec(
        str_regexp_extract_all, STR_REGEXP_EXTRACT_ALL_SQL
    ),
}
