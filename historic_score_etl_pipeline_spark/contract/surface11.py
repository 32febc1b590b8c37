"""Contract batch 16 — generic as-of join, SQL LATERAL, SQL PIVOT,
null-safe equality join, and XML ingest.  All five ORACLE-CHECKED.

* ``join_asof_backward`` — the *generic* backward as-of join (every
  event picks the most recent prior order-day of its user), implemented
  with the union-merge idiom: tag both streams, union, one window pass
  with ``last(..., ignorenulls=True)`` ordered by (time, tag), filter
  back to the probe rows.  ONE shuffle on the join key, no row
  explosion — the scalable alternative to the range-join + argmax
  formulation, and the engine's answer to the reference's "most recent
  matches before the fixture" pattern (`app/team_utilities.py:447`,
  `app/ref_utilities.py:133`).  Oracle: DuckDB's native ``ASOF LEFT
  JOIN`` — an independent implementation of the same semantics.
* ``join_lateral_topk`` — correlated LATERAL subquery (top-3 orders by
  price per customer) through the SQL parser; decorrelated by Catalyst
  into a ranked window join rather than a per-row re-scan.
* ``sql_pivot`` — the SQL ``PIVOT`` clause (5 event types × count+sum)
  — parser-level twin of the DataFrame ``groupBy().pivot()`` already
  covered by ``agg_pivot_activity``.
* ``join_null_safe`` — ``<=>`` (null-safe equality) full-outer join
  where NULL keys must pair up; oracle uses ``IS NOT DISTINCT FROM``.
* ``scan_xml`` — documents staged to XML (Spark 4 native source) and
  read back with an explicit schema; completes the format-plural ingest
  matrix (parquet/CSV/JSON/ORC/XML).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- generic backward as-of join ---------------------------------------------


def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the most recent order-day of the same user at or
    before the event time (NULL if none).  Orders are pre-aggregated to
    one row per (customer, day) so the as-of pick is deterministic; the
    union-merge window makes the whole join one hash-partition pass over
    ``key`` — state per key is a single scalar, never a buffered list."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    orders_daily = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_dec")
        )
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_orderdate").alias("t"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("o_orderdate").cast("string").alias("ord_date"),
            F.col("day_dec").cast("double").alias("day_total"),
        )
    )
    ev_side = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id"),
        F.lit(None).cast("string").alias("ord_date"),
        F.lit(None).cast("double").alias("day_total"),
    )
    merged = orders_daily.unionByName(ev_side)
    # Orders sort before events at equal time (tag 0 < 1) => inclusive
    # "at or before" semantics, matching the oracle's e.ts >= od.date.
    w = (
        Window.partitionBy("key")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn(
            "asof_date", F.last("ord_date", ignorenulls=True).over(w)
        )
        .withColumn(
            "asof_total", F.last("day_total", ignorenulls=True).over(w)
        )
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            "asof_date",
            "asof_total",
        )
    )


JOIN_ASOF_BACKWARD_SQL = """
WITH od AS (
  SELECT o_custkey, o_orderdate,
         CAST(o_orderdate AS VARCHAR) AS ord_date,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1, 2, 3
)
SELECT e.event_id, e.user_id, od.ord_date AS asof_date,
       od.day_total AS asof_total
FROM events e ASOF LEFT JOIN od
  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
"""


# --- LATERAL correlated subquery ---------------------------------------------


def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer via a correlated LATERAL
    subquery — the SQL spelling of the top-k-per-key pattern; Catalyst
    decorrelates it to a window-ranked join (no per-row re-scan)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM v_cust_lat c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM v_ord_lat o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 3) l
        """
    )


JOIN_LATERAL_SQL = """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c,
     LATERAL (SELECT o_orderkey, o_totalprice
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 3) l
"""


# --- SQL PIVOT clause --------------------------------------------------------

_PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]


def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause: per user-cohort, count + exact decimal sum
    for each of the 5 event types, widened to 10 columns in one
    shuffle.  Decimal inside the pivot keeps the sums order-independent
    for the hash compare; absent combos coalesce to 0."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_ev_piv")
    names = []
    for t in _PIVOT_TYPES:
        names.append(f"coalesce({t}_n, 0) AS {t}_n")
        names.append(f"CAST(coalesce({t}_sv, 0) AS DOUBLE) AS {t}_sv")
    in_list = ", ".join(f"'{t}'" for t in _PIVOT_TYPES)
    return spark.sql(
        f"""
        SELECT cohort, {", ".join(names)}
        FROM (SELECT user_id % 10 AS cohort, event_type,
                     CAST(value AS DECIMAL(18,6)) AS v
              FROM v_ev_piv)
        PIVOT (count(*) AS n, sum(v) AS sv FOR event_type IN ({in_list}))
        """
    )


_pivot_cols = ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS {t}_n,\n"
    f"  CAST(coalesce(sum(CAST(value AS DECIMAL(18,6)))"
    f" FILTER (WHERE event_type = '{t}'), 0) AS DOUBLE) AS {t}_sv"
    for t in _PIVOT_TYPES
)
SQL_PIVOT_SQL = f"""
SELECT user_id % 10 AS cohort,
  {_pivot_cols}
FROM events GROUP BY 1
"""


# --- null-safe equality join -------------------------------------------------


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join on a nullable key with ``<=>``: the NULL-key
    groups from both halves must pair into ONE row (plain ``=`` would
    drop them to opposite outer sides).  Key = l_returnflag with 'N'
    nulled out, sides = even/odd orderkeys."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("k")
    even = (
        li.where(F.col("l_orderkey") % 2 == 0).groupBy(k).count().alias("e")
    )
    odd = li.where(F.col("l_orderkey") % 2 == 1).groupBy(k).count().alias("o")
    return even.join(
        odd, F.col("e.k").eqNullSafe(F.col("o.k")), "full_outer"
    ).select(
        F.coalesce(F.col("e.k"), F.col("o.k")).alias("k"),
        F.coalesce(F.col("e.count"), F.lit(0)).alias("cnt_even"),
        F.coalesce(F.col("o.count"), F.lit(0)).alias("cnt_odd"),
    )


JOIN_NULL_SAFE_SQL = """
WITH e AS (SELECT nullif(l_returnflag, 'N') AS k, count(*) AS c
           FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
     o AS (SELECT nullif(l_returnflag, 'N') AS k, count(*) AS c
           FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1)
SELECT coalesce(e.k, o.k) AS k,
       coalesce(e.c, 0) AS cnt_even,
       coalesce(o.c, 0) AS cnt_odd
FROM e FULL JOIN o ON e.k IS NOT DISTINCT FROM o.k
"""


# --- XML ingest --------------------------------------------------------------

_XML_SCHEMA = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"


def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents' scalar columns staged to XML (Spark 4 built-in source)
    and read back with an explicit schema — no inference drift — then
    aggregated; hash-matches the oracle run on the original parquet."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    target = os.path.join(tempfile.mkdtemp(prefix="scan_xml_"), "docs_xml")
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(target)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(_XML_SCHEMA)
        .load(target)
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


SCAN_XML_SQL = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "join_asof_backward": QuerySpec(join_asof_backward, JOIN_ASOF_BACKWARD_SQL),
    "join_lateral_topk": QuerySpec(join_lateral_topk, JOIN_LATERAL_SQL),
    "sql_pivot": QuerySpec(sql_pivot, SQL_PIVOT_SQL),
    "join_null_safe": QuerySpec(join_null_safe, JOIN_NULL_SAFE_SQL),
    "scan_xml": QuerySpec(scan_xml, SCAN_XML_SQL),
}
