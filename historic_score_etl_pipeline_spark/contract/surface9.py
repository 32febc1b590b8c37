"""Contract batch 14 — completing the 22 TPC-H query shapes.

Batches 9/10 covered Q3/5/7/10/12/14/16/18/19/22; Q13's shape is
``agg_orders_per_cust_dist`` and Q17's correlated-average shape is
``subq_scalar_avg_qty``.  This batch adds the remaining ten: Q1 (full
pricing summary — the canonical scan-heavy aggregate), Q2 (correlated
min subquery re-joined), Q4 (EXISTS semi-join under a group count),
Q6 (global filter-aggregate, no join), Q8 (market-share ratio with two
nation roles), Q9 (profit expression over a 5-way join), Q11
(HAVING against an uncorrelated global scalar), Q15 (aggregate view ⋈
its own max), Q20 (nested IN with a correlated threshold), Q21
(EXISTS + NOT-EXISTS self-joins on the fact).

The fixtures have no ``partsupp`` (FIXTURES.md), so supply cost /
available stock are re-derived from lineitem where TPC-H uses partsupp:
Q2 takes min(l_extendedprice) per part as the "cost" to minimize, Q20
uses shipped-quantity-per-(supplier,part) against a correlated fraction
of the part's total.  The *plan shapes* — correlated decorrelation,
semi/anti self-joins, scalar broadcasts — are exactly TPC-H's.

Reference basis: the reference has no bulk SQL at all (its "queries"
are per-row Python loops, ``app/team_utilities.py:448-506``); this
surface is what a reference user graduating to warehouse-scale analysis
needs, and it exercises every remaining Catalyst decorrelation path.

Scale notes: every dimension (part 100 rows/SF-slice, supplier 1.5k,
nation 25) broadcasts; the only shuffles are lineitem⋈orders on
orderkey and the grouped-fact aggregates.  Money math stages through
DECIMAL so Spark and DuckDB agree exactly; averages divide exact
decimal sums as doubles (identical IEEE operands → identical result).
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


# --- Q1: pricing summary report ----------------------------------------------


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical scan-dominated aggregate: one pass over lineitem,
    eight aggregates per (returnflag, linestatus).  At 100 TB this is
    pure map-side partial aggregation — 6 groups mean the final shuffle
    moves ~6 rows per task.  Sums are exact decimals; averages divide
    the exact sums as doubles so both engines hit the same bits."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("date")
    )
    disc_price = _revenue()
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _money("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_money("l_quantity")).alias("sq"),
        F.sum(_money("l_extendedprice")).alias("sbp"),
        F.sum(disc_price).alias("sdp"),
        F.sum(charge).alias("sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.round(F.col("sdp"), 2).cast("double").alias("sum_disc_price"),
        F.round(F.col("sc"), 2).cast("double").alias("sum_charge"),
        F.round(
            F.col("sq").cast("double") / F.col("count_order"), 6
        ).alias("avg_qty"),
        F.round(
            F.col("sbp").cast("double") / F.col("count_order"), 6
        ).alias("avg_price"),
        "count_order",
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q2: minimum-cost supplier (correlated min re-joined) --------------------


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each mid-size part, the supplier(s) offering it at the
    minimum observed price inside region AMERICA.  partsupp doesn't
    exist in the fixtures, so the (part, supplier, cost) relation is
    derived from lineitem with cost = min(l_extendedprice) — the
    correlated-min-subquery-joined-back *shape* is exactly Q2's.
    The offer table groups then self-joins on its own per-part min;
    dims broadcast, so the only shuffle is the offer aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size").between(10, 20)) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    amer_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(amer_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    min_cost = offers.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        offers.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select(F.col("l_partkey").alias("p_partkey"), "l_suppkey", "cost")
        .join(F.broadcast(amer_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("s_acctbal").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("acctbal"),
            F.col("cost").alias("min_cost"),
        )
    )


TPCH_Q2_SQL = """
WITH amer_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
),
offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN amer_supp ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
  GROUP BY l_partkey, l_suppkey
)
SELECT o.l_partkey AS p_partkey, o.l_suppkey AS suppkey, s.s_name,
       s.n_name AS nation,
       CAST(round(CAST(s.s_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS acctbal,
       o.cost AS min_cost
FROM offers o
JOIN amer_supp s ON o.l_suppkey = s.s_suppkey
WHERE o.cost = (SELECT min(cost) FROM offers m WHERE m.l_partkey = o.l_partkey)
"""


# --- Q4: order-priority checking (EXISTS under a grouped count) --------------


def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in one quarter that had at least one returned line,
    counted per priority.  The EXISTS decorrelates to a left-semi join
    — the fact side is pre-filtered to returned lines and deduplicated
    map-side by the semi join itself (no distinct needed)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- Q6: forecast revenue change (global filter-aggregate) -------------------


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-join scan benchmark: one year of lineitem, three
    predicates, one global sum of extendedprice*discount.  All three
    predicates push to the parquet scan; the aggregate is one row —
    at 100 TB the network moves a few hundred partial-sum bytes."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_money("l_extendedprice") * _money("l_discount")), 2)
        .cast("double")
        .alias("revenue")
    )


TPCH_Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q8: national market share -----------------------------------------------


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-year: the fraction of ASIA-customer PROMO-part revenue
    supplied from NATION_5.  Both the numerator flag and denominator
    come from one joined pass (conditional sum over the same rows —
    never two jobs); nation plays two roles (supplier side filters
    nothing, customer side restricts to ASIA via region)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        li.join(F.broadcast(p.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    )
    rev = _revenue()
    zero = F.lit(0).cast("decimal(18,2)")
    g = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(zero))
        .alias("nat_rev"),
        F.sum(rev).alias("tot_rev"),
    )
    return g.select(
        "o_year",
        F.round(
            F.col("nat_rev").cast("double") / F.col("tot_rev").cast("double"), 6
        ).alias("mkt_share"),
    )


TPCH_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
GROUP BY year(o_orderdate)
"""


# --- Q9: product-type profit -------------------------------------------------


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year for color-named parts.
    TPC-H costs via partsupp; here cost = 0.1 * p_retailprice *
    l_quantity (part broadcasts, so the expression is map-side).
    All terms stay decimal until the final round."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    tenth = F.lit("0.1").cast("decimal(3,1)")
    profit = _revenue() - tenth * _money("p_retailprice") * _money("l_quantity")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(0.1 AS DECIMAL(3,1))
                        * CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q11: important stock (HAVING vs a global scalar) ------------------------


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose NATION_3-supplied value exceeds 0.1% of the
    nation's total supplied value.  The scalar denominator is the same
    aggregate re-used — computed once, broadcast as a 1-row frame into
    the HAVING filter (never recomputed per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_lines = li.join(
        F.broadcast(
            s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = nat_lines.groupBy("l_partkey").agg(
        F.sum(_money("l_extendedprice")).alias("val")
    )
    total = per_part.agg(F.sum("val").alias("tot"))
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("val").cast("double")
            > F.col("tot").cast("double") * F.lit(0.001)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


TPCH_Q11_SQL = """
WITH nat_lines AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey, sum(price) AS val FROM nat_lines GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(sum(val) AS DOUBLE) FROM per_part) * 0.001
"""


# --- Q15: top supplier (aggregate view joined to its own max) ----------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue.  The revenue
    "view" is computed once and cached by reuse — its max is a 1-row
    broadcast joined back, the classic argmax-without-window shape
    (works at any scale; a window over a global ORDER BY would
    single-partition)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


TPCH_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


# --- Q20: excess suppliers (nested IN + correlated threshold) ----------------


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in NATION_7 who shipped more than 10% of some red
    part's total shipped quantity.  TPC-H's ps_availqty threshold
    becomes a correlated fraction of the part's total — decorrelated
    to a per-part aggregate broadcast back into the pair filter; the
    outer IN becomes a left-semi join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    red_lines = li.join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    pair_qty = red_lines.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    part_qty = red_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    heavy = (
        pair_qty.join(F.broadcast(part_qty), F.col("l_partkey") == F.col("pk"))
        .where(F.col("pair_qty") > F.col("part_qty") * 0.1)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


TPCH_Q20_SQL = """
WITH red_lines AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
),
pair_qty AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
  FROM red_lines GROUP BY l_partkey, l_suppkey
),
part_qty AS (
  SELECT l_partkey AS pk, sum(l_quantity) AS part_qty
  FROM red_lines GROUP BY l_partkey
)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey FROM pair_qty JOIN part_qty ON l_partkey = pk
    WHERE pair_qty > part_qty * 0.1)
"""


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ------------


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finalized orders: suppliers whose line was returned, where
    another supplier participated in the order (EXISTS → left-semi on
    the order-supplier pair) but no *other* supplier's line was also
    returned (NOT EXISTS → left-anti).  Two self-joins of the same
    pre-aggregated pair frame — the pair distinct is the only shuffle
    and is reused three times."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(
            o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "has_return"
            )
        )
    )
    mine = pairs.where(F.col("has_return") == 1).select(
        "l_orderkey", "l_suppkey"
    )
    others = pairs.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_returned = pairs.where(F.col("has_return") == 1).select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    waiting = (
        mine.join(
            others,
            (F.col("l_orderkey") == F.col("o_key"))
            & (F.col("l_suppkey") != F.col("o_supp")),
            "left_semi",
        ).join(
            other_returned,
            (F.col("l_orderkey") == F.col("r_key"))
            & (F.col("l_suppkey") != F.col("r_supp")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(50)
    )


TPCH_Q21_SQL = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_return
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
mine AS (
  SELECT l_orderkey, l_suppkey FROM pairs WHERE has_return = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM mine m JOIN supplier ON m.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM pairs p
              WHERE p.l_orderkey = m.l_orderkey
                AND p.l_suppkey <> m.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = m.l_orderkey
                    AND p.l_suppkey <> m.l_suppkey AND p.has_return = 1)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 50
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q1_pricing_summary": QuerySpec(tpch_q1_pricing_summary, TPCH_Q1_SQL),
    "tpch_q2_min_cost_supplier": QuerySpec(
        tpch_q2_min_cost_supplier, TPCH_Q2_SQL
    ),
    "tpch_q4_priority_check": QuerySpec(tpch_q4_priority_check, TPCH_Q4_SQL),
    "tpch_q6_forecast_revenue": QuerySpec(
        tpch_q6_forecast_revenue, TPCH_Q6_SQL
    ),
    "tpch_q8_market_share": QuerySpec(tpch_q8_market_share, TPCH_Q8_SQL),
    "tpch_q9_product_profit": QuerySpec(tpch_q9_product_profit, TPCH_Q9_SQL),
    "tpch_q11_important_stock": QuerySpec(
        tpch_q11_important_stock, TPCH_Q11_SQL
    ),
    "tpch_q15_top_supplier": QuerySpec(tpch_q15_top_supplier, TPCH_Q15_SQL),
    "tpch_q20_excess_suppliers": QuerySpec(
        tpch_q20_excess_suppliers, TPCH_Q20_SQL
    ),
    "tpch_q21_waiting_suppliers": QuerySpec(
        tpch_q21_waiting_suppliers, TPCH_Q21_SQL
    ),
}
