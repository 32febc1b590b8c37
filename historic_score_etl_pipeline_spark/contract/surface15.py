"""Contract batch 20 — behavioral-analytics shapes (oracle-checked): the
funnel and cohort-retention queries every event-analytics engine ships.
No reference counterpart (the reference is a scraping ETL); these complete
the engine surface over the ``events`` stream table.

* ``funnel_click_purchase`` — ordered-sequence funnel: per user, the first
  click, the first purchase strictly AFTER that click, and the conversion
  flag; rolled up per signup-day cohort.  One aggregation pass: both
  "first X" picks are conditional ``min``s, the ordering constraint is a
  second conditional min over a precomputed threshold — no self-join of
  the event stream against itself.
* ``retention_cohort`` — cohort × day-offset retention matrix: users
  bucket by first-seen day, every (user, active-day) pair counts once
  toward (cohort, offset).  Two aggregations and one equi-join on
  user_id — the join carries one row per user on the build side, so at
  100 TB it broadcasts or buckets; never events × events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click → purchase conversion per user, aggregated by the day of the
    user's first event (the acquisition cohort).

    Stage 1 (ONE shuffle on user_id): an unordered whole-partition window
    broadcasts ``first_click = min(ts WHERE click)`` to every event row of
    the user, then a same-key aggregation applies the ordering constraint
    as ``max(CASE WHEN type='purchase' AND ts > first_click)`` — the
    groupBy reuses the window's hash partitioning, so no second shuffle
    and no per-user purchase buffer (the earlier formulation collected
    and sorted every purchase ts per user; unbounded agg state).
    Stage 2: tiny per-day rollup."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ev2 = ev.withColumn(
        "first_click",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    per_user = ev2.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("cohort_day"),
        F.max(
            F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
        ).alias("clicked_i"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click")),
                1,
            ).otherwise(0)
        ).alias("converted_i"),
    )
    return per_user.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("clicked_i").alias("n_clicked"),
        F.sum("converted_i").alias("n_converted"),
    )


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         strftime(min(ts), '%Y-%m-%d') AS cohort_day,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click
  FROM events GROUP BY user_id
),
conv AS (
  SELECT p.user_id, p.cohort_day,
         p.first_click IS NOT NULL AS clicked,
         p.first_click IS NOT NULL AND EXISTS (
           SELECT 1 FROM events e
           WHERE e.user_id = p.user_id AND e.event_type = 'purchase'
             AND e.ts > p.first_click
         ) AS converted
  FROM per_user p
)
SELECT cohort_day, count(*) AS n_users,
       CAST(sum(CASE WHEN clicked THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM conv GROUP BY cohort_day
"""


def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users cohorted by first-seen day; each active
    day counts toward (cohort_day, day_offset).  Offsets capped at 14 to
    keep the matrix dense."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(firsts, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .where(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
firsts AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', f.cohort_day, d.day) AS INTEGER) AS day_offset,
       count(*) AS n_active_users
FROM days d JOIN firsts f USING (user_id)
WHERE datediff('day', f.cohort_day, d.day) <= 14
GROUP BY 1, 2
"""





# --- fixed-bin histogram ------------------------------------------------------

_BIN_W = 25.0
_N_BINS = 20  # values ≥ _BIN_W*_N_BINS clamp into the last bin


def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (the monitoring/EDA shape):
    bin = clamped floor(value / width), counted per event_type.  One
    shuffle on (event_type, bin); the bin expression is pure codegen —
    at 100 TB this is the cheapest full-scan profile there is.  Empty
    bins are absent by design (sparse histogram); the consumer densifies
    against the fixed 0..N-1 bin domain."""
    ev = load_table(spark, sf_dir, "events")
    bin_idx = F.least(
        F.floor(F.col("value") / _BIN_W), F.lit(_N_BINS - 1)
    ).cast("int")
    return (
        ev.groupBy("event_type", bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.col("bin") * _BIN_W)
    )


AGG_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(least(floor(value / {_BIN_W}), {_N_BINS - 1}) AS INTEGER) AS bin,
       count(*) AS n,
       CAST(least(floor(value / {_BIN_W}), {_N_BINS - 1}) AS INTEGER)
         * {_BIN_W} AS bin_lo
FROM events
GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "funnel_click_purchase": QuerySpec(funnel_click_purchase, FUNNEL_SQL),
    "retention_cohort": QuerySpec(retention_cohort, RETENTION_SQL),
    "agg_histogram_bins": QuerySpec(agg_histogram_bins, AGG_HISTOGRAM_SQL),
}


# --- forward as-of join -------------------------------------------------------


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each click, the NEXT purchase at-or-after the
    click by the same user (NULL when none follows) — the attribution
    mirror of ``join_asof_lastn``.  Runs on the reversed-clock union-merge
    plan (operators/joins.py::asof_forward_join): one shuffle, one
    window, no join operator; the oracle states the naive conditional
    join + ASC rank, so the hash-match proves plan equivalence."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_forward_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    return asof_forward_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="c_ts",
        right_ts="p_ts",
        payload_cols=["purchase_id"],
        right_tiebreak="purchase_id",
    ).select("click_id", "user_id", "purchase_id")


JOIN_ASOF_FORWARD_SQL = """
SELECT click_id, user_id, purchase_id
FROM (
  SELECT c.click_id, c.user_id, p.purchase_id,
         row_number() OVER (PARTITION BY c.click_id
                            ORDER BY p.p_ts ASC, p.purchase_id ASC) AS rn
  FROM (SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click') c
  LEFT JOIN (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
             FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.p_user AND p.p_ts >= c.c_ts
) WHERE rn = 1
"""

QUERIES["join_asof_forward"] = QuerySpec(join_asof_forward, JOIN_ASOF_FORWARD_SQL)


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of: each purchase matched to the latest prior click
    by the same user ONLY if that click is within 2 hours (else NULL).
    Same union-merge plan as join_asof_lastn plus a constant-time
    staleness mask; the oracle restricts the join window instead — the
    hash-match proves the equivalence (for the nearest-prior row, masking
    after ≡ restricting before)."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_tolerance_join,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    return asof_tolerance_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        payload_cols=["click_id"],
        tolerance="2 hours",
        right_tiebreak="click_id",
    ).select("purchase_id", "user_id", "click_id")


JOIN_ASOF_TOLERANCE_SQL = """
SELECT purchase_id, user_id, click_id
FROM (
  SELECT p.purchase_id, p.user_id, c.click_id,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
  FROM (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
             FROM events WHERE event_type = 'click') c
    ON p.user_id = c.c_user AND c.c_ts <= p.p_ts
       AND c.c_ts >= p.p_ts - INTERVAL 2 HOUR
) WHERE rn = 1
"""

QUERIES["join_asof_tolerance"] = QuerySpec(
    join_asof_tolerance, JOIN_ASOF_TOLERANCE_SQL
)
