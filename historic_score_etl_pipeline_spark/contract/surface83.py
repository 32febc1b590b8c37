"""Round-6 batch 90 — view-chain inlining, active-day gaps,
role-playing date dims, exact proration, txn-log time travel (overflow
slots):

* ``sql_view_chain_inlining`` — three chained temp views (filter →
  derive → aggregate) collapse into ONE scan through the optimizer —
  the semantic-layer composition pattern; the plan test asserts a
  single Exchange and merged filters.
* ``event_active_day_gap_histogram`` — per user the gaps between
  consecutive ACTIVE DAYS (distinct-day grain, not event grain — the
  event-level sibling is ``event_interarrival_median``); histogram of
  gap lengths.
* ``join_role_playing_date_dim`` — ONE conformed calendar dim joined in
  TWO roles (order quarter × ship quarter) — the classic warehouse
  role-playing pattern; revenue matrix by both roles.
* ``date_proration_split`` — billing proration: each order's cents
  spread over a 45-day service window ACROSS months, integer shares
  cents·days_m div total_days with the remainder pinned to the first
  month so ΣSHARES = cents exactly (conservation-tested).
* ``scan_txn_log_time_travel`` — time travel over the batch-80
  transaction log: resolve the live file set AS OF version 1 (before
  file_a's removal) and scan THAT snapshot — the versioned-read half of
  the lakehouse pattern.

Scale notes: view chains are resolved at plan time (zero runtime
cost); day gaps ride one user-partitioned window over the distinct
(user, day) table; the role-playing joins broadcast the |days|-row
calendar dim twice; proration explodes ≤3 month-shares per order;
time travel folds only the log prefix (driver-side, metadata-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- view-chain inlining ---------------------------------------------------------------------


def sql_view_chain_inlining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 (filter) → v2 (derived cents) → v3 (rollup): the chain must
    collapse to one scan; the result is the rollup."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_chain_base"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_chain_1 AS
        SELECT * FROM v_chain_base WHERE l_quantity >= 10
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_chain_2 AS
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS net_cents
        FROM v_chain_1 WHERE l_discount <= 0.05
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(net_cents) AS BIGINT) AS net_total
        FROM v_chain_2 GROUP BY l_returnflag
        """
    )


SQL_VIEW_CHAIN_INLINING_SQL = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS net_total
FROM lineitem
WHERE l_quantity >= 10 AND l_discount <= 0.05
GROUP BY l_returnflag
"""


# --- active-day gap histogram ----------------------------------------------------------------


def event_active_day_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps (days) between consecutive ACTIVE days per user; histogram
    of gap lengths across all users."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("dn"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dn")
    gaps = ud.select(
        "user_id", (F.col("dn") - F.lag("dn").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    return gaps.groupBy(F.col("gap").cast("long").alias("gap_days")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


EVENT_ACTIVE_DAY_GAP_HISTOGRAM_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn
  FROM events
), gaps AS (
  SELECT user_id,
         dn - lag(dn) OVER (PARTITION BY user_id ORDER BY dn) AS gap
  FROM ud
)
SELECT CAST(gap AS BIGINT) AS gap_days,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM gaps WHERE gap IS NOT NULL GROUP BY 1
"""


# --- role-playing date dim --------------------------------------------------------------------


def join_role_playing_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE calendar dim (date → quarter label) joined as order-date AND
    ship-date roles; net revenue matrix by (order_q, ship_q)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.to_date("o_orderdate").alias("od"),
        F.to_date("l_shipdate").alias("sd"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    # conformed dim: every date in either role
    dim = (
        fact.select(F.col("od").alias("d"))
        .unionByName(fact.select(F.col("sd").alias("d")))
        .distinct()
        .select(
            "d",
            F.concat(
                F.year("d").cast("string"), F.lit("-Q"),
                F.quarter("d").cast("string"),
            ).alias("q"),
        )
    )
    return (
        fact.join(
            F.broadcast(dim.select(F.col("d").alias("od"),
                                   F.col("q").alias("order_q"))),
            "od",
        )
        .join(
            F.broadcast(dim.select(F.col("d").alias("sd"),
                                   F.col("q").alias("ship_q"))),
            "sd",
        )
        .groupBy("order_q", "ship_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


JOIN_ROLE_PLAYING_DATE_DIM_SQL = """
WITH fact AS (
  SELECT CAST(o.o_orderdate AS DATE) AS od,
         CAST(l.l_shipdate AS DATE) AS sd,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT concat(CAST(year(od) AS VARCHAR), '-Q',
              CAST(quarter(od) AS VARCHAR)) AS order_q,
       concat(CAST(year(sd) AS VARCHAR), '-Q',
              CAST(quarter(sd) AS VARCHAR)) AS ship_q,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(cents) AS BIGINT) AS cents
FROM fact GROUP BY 1, 2
"""


# --- exact proration --------------------------------------------------------------------------

_PRORATE_DAYS = 45


def date_proration_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prorate each order's cents over a 45-day service window across
    months: share_m = cents · days_m div 45, remainder pinned to the
    FIRST month (Σshares = cents exactly); per month the prorated
    total."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.to_date("o_orderdate").alias("start"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    # explode the window's months: month offsets 0..2 cover 45 days
    spans = o.select(
        "k",
        "start",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("mo"),
    ).select(
        "k",
        "start",
        "cents",
        F.trunc(F.add_months("start", F.col("mo")), "month").alias("m"),
    )
    # days of the window inside month m
    m_start = F.greatest(F.col("start"), F.col("m"))
    m_end = F.least(
        F.date_add(F.col("start"), _PRORATE_DAYS),
        F.add_months(F.col("m"), 1),
    )
    days_m = F.datediff(m_end, m_start)
    spans = spans.withColumn("days_m", days_m).where(F.col("days_m") > 0)
    share = F.expr(f"(cents * days_m) div {_PRORATE_DAYS}")
    first = F.col("m") == F.trunc("start", "month")
    # remainder = cents − Σ floor-shares; pin to the first month.  The
    # window MUST be per-order (o_orderkey): partitioning by
    # (start, cents) merges distinct orders that share a date and a
    # rounded total — no collision exists at sf≤0.1 but ~625 orders/day
    # at sf1 make one statistically certain, breaking Σshares = cents.
    wsum = Window.partitionBy("k")
    spans = spans.withColumn("share", share.cast("long")).withColumn(
        "rem",
        (F.col("cents") - F.sum("share").over(wsum)).cast("long"),
    )
    prorated = spans.select(
        F.date_format("m", "yyyy-MM").alias("ym"),
        (F.col("share") + F.when(first, F.col("rem")).otherwise(0))
        .cast("long")
        .alias("p"),
    )
    return prorated.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("p").cast("long").alias("prorated_cents"),
    )


DATE_PRORATION_SPLIT_SQL = f"""
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_orderdate AS DATE) AS start,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), spans0 AS (
  SELECT k, start, cents,
         date_trunc('month', start + to_months(CAST(t.mo AS INTEGER)))
           AS m
  FROM o, unnest([0, 1, 2]) AS t(mo)
), spans AS (
  SELECT k, start, cents, m,
         date_diff('day',
           greatest(start, CAST(m AS DATE)),
           least(start + {_PRORATE_DAYS},
                 CAST(m AS DATE) + INTERVAL 1 MONTH)) AS days_m
  FROM spans0
), pos AS (
  SELECT k, start, cents, m, days_m,
         (cents * days_m) // {_PRORATE_DAYS} AS share,
         m = date_trunc('month', start) AS is_first
  FROM spans WHERE days_m > 0
), withrem AS (
  SELECT k, start, cents, m, share, is_first,
         cents - sum(share) OVER (PARTITION BY k) AS rem
  FROM pos
)
SELECT strftime(m, '%Y-%m') AS ym,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(share + CASE WHEN is_first THEN rem ELSE 0 END) AS BIGINT)
         AS prorated_cents
FROM withrem GROUP BY 1
"""


# --- txn-log time travel -----------------------------------------------------------------------


def _live_files_as_of(table_dir: str, version: int) -> list[str]:
    """Fold only the log PREFIX up to ``version`` (inclusive) — the
    snapshot-resolution step of versioned reads."""
    import glob
    import json
    import os

    live: set[str] = set()
    logs = sorted(glob.glob(os.path.join(table_dir, "_txn_log", "*.json")))
    for path in logs[: version + 1]:
        with open(path) as f:
            entry = json.load(f)
        if "add" in entry:
            live.add(entry["add"])
        if "remove" in entry:
            live.discard(entry["remove"])
    return [os.path.join(table_dir, name) for name in sorted(live)]


def scan_txn_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the batch-80 transaction-log table AS OF version 1 — before
    file_a's removal: the snapshot containing residues {0, 1}."""
    from historic_score_etl_pipeline_spark.contract.surface73 import (
        _staged_txn_table,
    )

    table_dir = _staged_txn_table(spark, sf_dir)
    live = _live_files_as_of(table_dir, 1)
    df = spark.read.parquet(*live)
    return df.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
    )


SCAN_TXN_LOG_TIME_TRAVEL_SQL = """
SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "sql_view_chain_inlining": QuerySpec(
        sql_view_chain_inlining, SQL_VIEW_CHAIN_INLINING_SQL
    ),
    "event_active_day_gap_histogram": QuerySpec(
        event_active_day_gap_histogram, EVENT_ACTIVE_DAY_GAP_HISTOGRAM_SQL
    ),
    "join_role_playing_date_dim": QuerySpec(
        join_role_playing_date_dim, JOIN_ROLE_PLAYING_DATE_DIM_SQL
    ),
    "date_proration_split": QuerySpec(
        date_proration_split, DATE_PRORATION_SPLIT_SQL
    ),
    "scan_txn_log_time_travel": QuerySpec(
        scan_txn_log_time_travel, SCAN_TXN_LOG_TIME_TRAVEL_SQL
    ),
}
