"""Contract batch 4 — window functions + streaming-equivalent queries
(SURVEY.md §2G/§2H/§2I)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.aggregates import decimal_sum_double
from historic_score_etl_pipeline_spark.operators.windows import (
    ffill,
    running_sum,
    topk_per_key,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- G2/H2: top-k most recent per key -------------------------------------

def window_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last 5 shipments per supplier — "last 10 recent games per team"
    (app/team_utilities.py:447) with an explicit total order
    (shipdate desc, orderkey/linenumber tiebreak)."""
    li = load_table(spark, sf_dir, "lineitem")
    return topk_per_key(
        li,
        ["l_suppkey"],
        [
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
        ],
        k=5,
    ).select("l_suppkey", "rn", "l_orderkey", "l_linenumber")


WINDOW_TOPK_RECENT_SQL = """
SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate DESC, l_orderkey DESC,
                                     l_linenumber DESC) AS rn
  FROM lineitem
) WHERE rn <= 5
"""


# --- H1: forward-fill -----------------------------------------------------

def window_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rowspan'd-date forward-fill (app/ref_utilities.py:103).  Gaps
    are synthesized deterministically (every event_id ≡ 0,1 mod 7 is
    nulled), then filled from the latest prior non-null within the user's
    event_id order."""
    ev = load_table(spark, sf_dir, "events")
    gappy = F.when(F.col("event_id") % 7 >= 2, F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        gappy.alias("gappy_value"),
        ffill(gappy, ["user_id"], ["event_id"]).alias("filled_value"),
    )


WINDOW_FFILL_SQL = """
SELECT event_id, user_id, gappy_value,
       last_value(gappy_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM (
  SELECT event_id, user_id,
         CASE WHEN event_id % 7 >= 2 THEN value END AS gappy_value
  FROM events
)
"""


# --- H2: running total (frame spec proof) ---------------------------------

def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend per customer over order time — DECIMAL-exact prefix
    sums, (orderdate, orderkey) total order."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        running_sum(
            "o_totalprice", ["o_custkey"], ["o_orderdate", "o_orderkey"]
        ).alias("run_total"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS run_total
FROM orders
"""


# --- I1: tumbling daily window (batch-equivalent) -------------------------

def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling aggregation — the reference's 2-day micro-batch
    cadence (app/main.py:19) generalized.  The day bucket is computed from
    raw epoch micros (pure integer arithmetic) so the result is identical
    under ANY session timezone — the streaming twin in
    streaming/windows.py uses ``window(ts, '1 day')`` which is
    equivalent under UTC."""
    ev = load_table(spark, sf_dir, "events")
    day_idx = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
    day = F.date_format(
        F.date_add(F.to_date(F.lit("1970-01-01")), day_idx.cast("int")),
        "yyyy-MM-dd",
    )
    return (
        ev.groupBy(day.alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            decimal_sum_double("value").alias("sum_value"),
        )
    )


STREAM_TUMBLING_DAILY_SQL = """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


# --- I2: sliding window count (rows-only) ---------------------------------

def stream_sliding_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h window every 1h (batch-equivalent of the streaming
    sliding count).  Window boundaries derived from epoch micros for
    timezone independence.  Oracle-checked since round 2: the overlap
    explode is ``unnest`` of the two window starts in DuckDB — the same
    expand-then-group plan, so the hash must match exactly."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = F.floor(F.unix_micros(F.col("ts")) / F.lit(3_600_000_000))
    # Each event belongs to 2 sliding windows: [h-1, h+1) and [h, h+2).
    ev2 = ev.select(
        "event_id",
        "value",
        F.explode(
            F.array(hour_idx - 1, hour_idx)
        ).alias("win_start_hour"),
    )
    return (
        ev2.groupBy("win_start_hour")
        .agg(F.count("*").alias("n_events"))
        .orderBy("win_start_hour")
    )


STREAM_SLIDING_COUNT_SQL = """
SELECT win_start_hour, count(*) AS n_events
FROM (
  SELECT event_id,
         unnest([CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) - 1,
                 CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)])
           AS win_start_hour
  FROM events
)
GROUP BY win_start_hour
"""


# --- I4: session window ----------------------------------------------------

def stream_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user — batch
    twin of ``session_window(ts, '30 minutes')``.  Expressed with the
    classic gaps-and-islands window idiom (lag + cumulative flag), which
    is exactly what Spark's session_window compiles to in batch mode.
    Oracle-checked since round 2 via the same idiom in DuckDB."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    with_flag = ev.withColumn(
        "new_session",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
            > gap_us
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_flag.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


STREAM_SESSION_GAP_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM ids GROUP BY user_id, session_id
"""


QUERIES: dict[str, QuerySpec] = {
    "window_topk_recent": QuerySpec(window_topk_recent, WINDOW_TOPK_RECENT_SQL),
    "window_ffill": QuerySpec(window_ffill, WINDOW_FFILL_SQL),
    "window_running_sum": QuerySpec(window_running_sum, WINDOW_RUNNING_SUM_SQL),
    "stream_tumbling_daily": QuerySpec(stream_tumbling_daily, STREAM_TUMBLING_DAILY_SQL),
    "stream_sliding_count": QuerySpec(
        stream_sliding_count, STREAM_SLIDING_COUNT_SQL
    ),
    "stream_session_gap": QuerySpec(stream_session_gap, STREAM_SESSION_GAP_SQL),
}
