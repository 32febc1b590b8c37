"""Contract batch 10 — the rest of the classic decision-support surface.

Complements batch 9 (surface4.py) with the TPC-H shapes that exercise the
remaining planner paths: self-joined dimensions (Q7), disjunctive
OR-of-ANDs join predicates (Q19), NOT-IN anti-join under a distinct
aggregate (Q16), HAVING-driven semi-join of a grouped fact (Q18),
conditional CASE aggregation (Q12), ratio-of-conditional-sums (Q14),
returned-item top-k (Q10), and anti-join + uncorrelated scalar filter
(Q22).  The fixture tables lack some stock TPC-H columns (no partsupp,
l_shipmode, p_container, c_phone), so each query keeps the *shape* and
adapts predicates to the columns that exist (FIXTURES.md).

Scale notes are inline per query; the common rules: part/supplier/nation
are dimension-sized → broadcast; lineitem⋈orders is the one real shuffle
and always keys on orderkey; money arithmetic stages through DECIMAL so
Spark and DuckDB agree bit-for-bit after round().

Reference basis: the reference never runs bulk joins (its joins are
per-row loops, ``app/team_utilities.py:448-506``); this batch proves the
engine surface a reference user migrating real warehouse queries needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _money(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _revenue() -> F.Column:
    return _money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _money("l_discount")
    )


# --- Q7: volume shipping between two nations --------------------------------


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume: supplier-nation ↔ customer-nation pairs.
    nation joins twice (aliased) — both broadcast, so the double use
    costs nothing.  The pair filter ((1,2)|(2,1)) is applied *after*
    both nation joins but Catalyst pushes each side's IsIn(NATION_1,
    NATION_2) through the join into the dimension scans."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).alias("rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round("rev", 2).cast("double").alias("revenue"),
        )
    )


TPCH_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# --- Q10: returned-item revenue, top 20 customers ---------------------------


def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in one quarter.  The
    quarter filter prunes orders at the scan; returned-flag filter
    prunes lineitem; the join then shuffles only the surviving slices.
    Top-20 has a full total order (revenue desc, custkey) so the limit
    is deterministic."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).alias("rev"), F.max(_money("c_acctbal")).alias("bal"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round("rev", 2).cast("double").alias("revenue"),
            F.col("bal").cast("double").alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = """
SELECT c_custkey, c_name, n_name AS nation,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue,
       CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q12: conditional CASE aggregation over a join --------------------------


def tpch_q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per line-status, how many lines belong to high- vs low-priority
    orders (Q12's CASE-sum shape; fixtures lack l_shipmode so the group
    key is l_linestatus).  One scan, one join, both counts from the
    same pass — never two filtered jobs for what one conditional
    aggregation expresses."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus
"""


# --- Q14: ratio of conditional sums ------------------------------------------


def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-type revenue share for one ship-month: 100 * promo_rev /
    total_rev from a single scan+join.  Both sums are exact decimals;
    only the final ratio goes through double.  part is broadcast — at
    100 TB the lineitem side partitions by whatever the month filter
    leaves and never shuffles (the aggregate is global, map-side
    partials collapse to one row per task)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.col("p_type") == "PROMO"
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(promo, _revenue()).otherwise(F.lit(0).cast("decimal(18,2)")))
            .alias("promo_rev"),
            F.sum(_revenue()).alias("total_rev"),
        )
        .select(
            F.round(F.col("promo_rev") * 100 / F.col("total_rev"), 4)
            .cast("double")
            .alias("promo_share_pct")
        )
    )


TPCH_Q14_SQL = """
SELECT CAST(round(100 * sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END)
              / sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 4) AS DOUBLE)
           AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


# --- Q16: distinct-count with NOT-IN anti-join -------------------------------


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) bucket, excluding suspect
    suppliers (NOT IN ≡ left-anti; s_suppkey is non-null so the NULL
    trap of NOT IN doesn't bite).  The anti side is tiny → broadcast
    anti-join, zero shuffle added.  countDistinct forces a per-group
    dedup — Spark plans it as a two-phase partial/final expand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#5")
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


# --- Q18: HAVING-driven semi-join of a grouped fact --------------------------


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 350.  The grouped-fact
    qualifier (groupBy orderkey HAVING sum > 350) is computed once and
    joined back — both the qualifier shuffle and the detail join key on
    l_orderkey, so AQE reuses the exchange.  At sf0.01 the qualifier
    side is 8 keys → broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_okey"))
        .agg(F.sum(_money("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 350)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("big_okey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            _money("o_totalprice").cast("double").alias("totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


TPCH_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM orders
JOIN (SELECT l_orderkey AS big_okey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 350) ON o_orderkey = big_okey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


# --- Q19: disjunctive OR-of-ANDs join predicate ------------------------------


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three brand/size/quantity bands OR'd together on top of the
    partkey equi-join.  Written so the equi-join key stays clean (hash
    join on partkey; the disjunction is a post-join filter Catalyst
    can't turn into a join key — but it CAN push the common
    `p_size >= 1` and per-branch brand prune into the part scan via
    constraint propagation).  The stock-TPC-H trap is accidentally
    forcing a nested-loop join by putting the OR in the join condition;
    keeping ON = equi-key only is the 100 TB-safe form."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
    )


TPCH_Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q22: anti-join + uncorrelated scalar filter ------------------------------


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no urgent orders, bucketed by the
    trailing two digits of the customer name (fixtures lack c_phone).
    Two classic sub-plans composed: an uncorrelated scalar (global
    positive-balance average) broadcast-cross-joined as a filter, and a
    left-anti join against the urgent-orders side.  The anti probe keys
    on custkey — same key as any customer join, buckets reusable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg(_money("c_acctbal")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(_money("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 17, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_money("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = """
SELECT substr(c_name, 17, 2) AS code,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
        (SELECT avg(CAST(c_acctbal AS DECIMAL(18,2)))
         FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY substr(c_name, 17, 2)
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q7_volume_shipping": QuerySpec(tpch_q7_volume_shipping, TPCH_Q7_SQL),
    "tpch_q10_returned_revenue": QuerySpec(tpch_q10_returned_revenue, TPCH_Q10_SQL),
    "tpch_q12_priority_counts": QuerySpec(tpch_q12_priority_counts, TPCH_Q12_SQL),
    "tpch_q14_promo_share": QuerySpec(tpch_q14_promo_share, TPCH_Q14_SQL),
    "tpch_q16_supplier_cnt": QuerySpec(tpch_q16_supplier_cnt, TPCH_Q16_SQL),
    "tpch_q18_large_orders": QuerySpec(tpch_q18_large_orders, TPCH_Q18_SQL),
    "tpch_q19_disjunctive": QuerySpec(tpch_q19_disjunctive, TPCH_Q19_SQL),
    "tpch_q22_idle_customers": QuerySpec(tpch_q22_idle_customers, TPCH_Q22_SQL),
}
