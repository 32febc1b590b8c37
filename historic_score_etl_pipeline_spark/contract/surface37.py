"""Round-6 batch 44 — product-analytics event staples:

* ``event_stickiness_dau_wau`` — per day: DAU, trailing-7-day WAU and
  the DAU/WAU stickiness ratio in exact ppm.  The distinct (user, day)
  table joins a broadcast |days|-row calendar dim on a 0..6-day offset
  (≤7× fan-out of the ALREADY-distinct table, never the raw events),
  then one aggregate takes both distinct counts.
* ``event_bounce_rate`` — sessions are (user, day); a bounce is a
  single-event session; per day: sessions, bounces, exact ppm rate.
* ``event_new_vs_returning`` — per day: DAU split into first-seen-today
  vs returning, plus the cumulative user base (a global running sum
  over the |days|-row aggregate — never the fact table).
* ``event_hour_heatmap`` — (weekday × hour) traffic grid with each
  cell's exact ppm share of total.  Weekday = (epoch_days + 3) mod 7,
  0 = Monday — the engine-portable formula (dayofweek() NUMBERING
  diverges across engines; epoch arithmetic has one answer).
* ``event_streak_longest`` — longest run of consecutive active days
  per user: classic gaps-and-islands (epoch_day − row_number is
  constant within a run) over the distinct (user, day) table.

Scale notes: every query pre-shrinks to a distinct/grouped table
before any window or fan-out; global windows and the one broadcast
total-scalar run over |days|- or 168-row aggregates (ARCHITECTURE.md
§scalar folding rule), never data-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.pins import pin
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )


def _day_str(col: str = "day") -> F.Column:
    return F.date_format(F.col(col), "yyyy-MM-dd").alias("day")


# --- DAU / WAU stickiness -------------------------------------------------------


def event_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7d WAU, and DAU/WAU ppm per observed day."""
    du = (
        _events(spark, sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    # Pinned (lazy, r11): du feeds the calendar spine AND the join
    # probe — unpinned, the events scan + distinct executed twice
    # (plan audit).  Modest locally (1.45 s → 1.40 s) but one corpus
    # pass instead of two at any scale.
    du = pin(du)
    cal = du.select(F.col("day").alias("cal_day")).distinct()
    j = du.join(
        F.broadcast(cal),
        (F.datediff(F.col("cal_day"), F.col("day")) >= 0)
        & (F.datediff(F.col("cal_day"), F.col("day")) <= 6),
    )
    agg = j.groupBy("cal_day").agg(
        F.countDistinct(
            F.when(F.col("day") == F.col("cal_day"), F.col("user_id"))
        )
        .cast("long")
        .alias("dau"),
        F.countDistinct("user_id").cast("long").alias("wau"),
    )
    return agg.select(
        F.date_format("cal_day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.expr("(dau * 1000000) div wau").cast("long").alias("stickiness_ppm"),
    )


EVENT_STICKINESS_DAU_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), cal AS (
  SELECT DISTINCT day AS cal_day FROM du
), a AS (
  SELECT c.cal_day,
         CAST(count(DISTINCT CASE WHEN d.day = c.cal_day
                                  THEN d.user_id END) AS BIGINT) AS dau,
         CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau
  FROM du d JOIN cal c
    ON c.cal_day - d.day BETWEEN 0 AND 6
  GROUP BY c.cal_day
)
SELECT strftime(cal_day, '%Y-%m-%d') AS day, dau, wau,
       CAST((dau * 1000000) // wau AS BIGINT) AS stickiness_ppm
FROM a
"""


# --- bounce rate ----------------------------------------------------------------


def event_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-event (user, day) sessions as a ppm share per day."""
    sess = (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    agg = sess.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounce"),
    )
    return agg.select(
        _day_str(),
        "n_sessions",
        "n_bounce",
        F.expr("(n_bounce * 1000000) div n_sessions")
        .cast("long")
        .alias("bounce_ppm"),
    )


EVENT_BOUNCE_RATE_SQL = """
WITH sess AS (
  SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n_ev
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), a AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce
  FROM sess GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_sessions, n_bounce,
       CAST((n_bounce * 1000000) // n_sessions AS BIGINT) AS bounce_ppm
FROM a
"""


# --- new vs returning -----------------------------------------------------------


def event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: DAU split into first-seen-today vs returning users,
    plus the cumulative registered-user base.  The running sum windows
    over the |days|-row aggregate."""
    du = (
        _events(spark, sf_dir)
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    daily = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    first = du.groupBy("user_id").agg(F.min("day").alias("d0"))
    news = first.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    j = daily.join(news, "day", "left").select(
        "day", "dau", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        _day_str(),
        "dau",
        F.col("new_users").cast("long").alias("new_users"),
        (F.col("dau") - F.col("new_users")).cast("long").alias("returning"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


EVENT_NEW_VS_RETURNING_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
), news AS (
  SELECT d0 AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM (SELECT user_id, min(day) AS d0 FROM du GROUP BY user_id)
  GROUP BY d0
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       d.dau,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(d.dau - coalesce(n.new_users, 0) AS BIGINT) AS returning,
       CAST(sum(coalesce(n.new_users, 0)) OVER (
              ORDER BY d.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily d LEFT JOIN news n ON d.day = n.day
"""


# --- weekday × hour heatmap -----------------------------------------------------


def event_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic grid by (weekday, hour) with exact ppm shares; the total
    folds in as a 1-row broadcast scalar (ARCHITECTURE.md §scalar
    folding rule)."""
    ev = _events(spark, sf_dir)
    cell = ev.select(
        ((F.unix_date(F.col("ts").cast("date")) + 3) % 7)
        .cast("long")
        .alias("dow_monday0"),
        F.hour("ts").cast("long").alias("hr"),
    )
    agg = cell.groupBy("dow_monday0", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = agg.agg(F.sum("n").alias("total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "dow_monday0",
            "hr",
            "n",
            F.expr("(n * 1000000) div total").cast("long").alias("share_ppm"),
        )
    )


EVENT_HOUR_HEATMAP_SQL = """
WITH cell AS (
  SELECT CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) % 7
              AS BIGINT) AS dow_monday0,
         CAST(extract(hour FROM ts) AS BIGINT) AS hr
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), a AS (
  SELECT dow_monday0, hr, CAST(count(*) AS BIGINT) AS n
  FROM cell GROUP BY 1, 2
)
SELECT dow_monday0, hr, n,
       CAST((n * 1000000) // (SELECT sum(n) FROM a) AS BIGINT) AS share_ppm
FROM a
"""


# --- longest consecutive-day streak ----------------------------------------------


def event_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over distinct active days per user:
    epoch_day − row_number is constant within a consecutive run."""
    du = (
        _events(spark, sf_dir)
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = du.select(
        "user_id",
        (F.unix_date("day") - F.row_number().over(w)).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").cast("long").alias("n_active_days"),
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


EVENT_STREAK_LONGEST_SQL = """
WITH du AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), isl AS (
  SELECT user_id,
         CAST(day - DATE '1970-01-01' AS BIGINT)
           - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM du
), runs AS (
  SELECT user_id, island, count(*) AS run_len
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(run_len) AS BIGINT) AS n_active_days,
       CAST(max(run_len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "event_stickiness_dau_wau": QuerySpec(
        event_stickiness_dau_wau, EVENT_STICKINESS_DAU_WAU_SQL
    ),
    "event_bounce_rate": QuerySpec(event_bounce_rate, EVENT_BOUNCE_RATE_SQL),
    "event_new_vs_returning": QuerySpec(
        event_new_vs_returning, EVENT_NEW_VS_RETURNING_SQL
    ),
    "event_hour_heatmap": QuerySpec(event_hour_heatmap, EVENT_HOUR_HEATMAP_SQL),
    "event_streak_longest": QuerySpec(
        event_streak_longest, EVENT_STREAK_LONGEST_SQL
    ),
}
