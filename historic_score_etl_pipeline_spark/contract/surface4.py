"""Contract batch 9 — decision-support join/subquery surface.

The reference never performs a bulk relational join (its joins are
imperative per-row loops, `app/team_utilities.py:448-506`), so this
batch proves the engine's *planner-facing* surface on the classic
decision-support shapes a warehouse user actually writes — multi-way
joins, EXISTS/scalar correlated subqueries decorrelated into joins,
and two-level aggregation.  Shapes follow TPC-H Q3/Q5/Q4/Q17/Q11/Q13,
adapted to the fixture columns (no partsupp/commitdate in the synthetic
tables).

Every Spark side is written the way Catalyst wants it: subqueries are
decorrelated *explicitly* into aggregate-then-join (what the optimizer
would do anyway, but stated so the plan is inspectable), dimension
sides are broadcast, and fact⋈fact joins shuffle on their natural keys.

* ``tpch_q3_shipping_priority`` — segment filter → 3-way join → revenue
  agg → deterministic top-10.
* ``tpch_q5_local_revenue`` — 6-table star join with the "local
  supplier" same-nation predicate; per-nation revenue.
* ``subq_exists_returned`` — EXISTS(correlated) ≡ left-semi join:
  orders with ≥1 returned line, counted per priority.
* ``subq_scalar_avg_qty`` — correlated scalar subquery (Q17):
  below-20%-of-per-part-average lines, decorrelated to agg⋈join.
* ``subq_global_fraction`` — uncorrelated scalar subquery in HAVING
  (Q11): nations holding > 4% of global supplier balance, via a
  broadcast single-row cross join.
* ``agg_orders_per_cust_dist`` — two-level aggregation with outer join
  (Q13): orders-per-customer histogram including zero-order customers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


_CUTOFF = "1995-03-15"


def _money(col: str) -> F.Column:
    """Exact decimal staging for money aggregation (double sums drift
    between engines; decimal sums don't)."""
    return F.col(col).cast("decimal(18,2)")


def _revenue() -> F.Column:
    return (
        _money("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _money("l_discount"))
    )


# --- TPC-H Q3: shipping priority ------------------------------------------


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-revenue top-10.  The segment-filtered customer side is
    dimension-sized after its filter → broadcast into orders; the
    surviving orders ⋈ lineitem is the one real shuffle, keyed on
    l_orderkey (the fact table's natural clustering at scale).  The
    top-10 is a deterministic total order (revenue desc, orderkey)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(_CUTOFF).cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_CUTOFF).cast("date")
    )
    return (
        li.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue()).alias("rev"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("string").alias("orderdate"),
            F.round("rev", 2).cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


TPCH_Q3_SQL = f"""
SELECT l_orderkey AS orderkey,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '{_CUTOFF}'
  AND l_shipdate > DATE '{_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


# --- TPC-H Q5: local-supplier revenue per nation ---------------------------


def tpch_q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join.  The same-nation "local supplier" predicate
    (c_nationkey = s_nationkey) is the join-graph cycle that separates
    this from a plain snowflake.  supplier/nation/region are broadcast
    (dimension-sized at any SF); customer⋈orders and ⋈lineitem shuffle
    on their keys.  At 100 TB the plan is identical — only the two fact
    shuffles grow."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).alias("rev"))
        .select(
            F.col("n_name").alias("nation"),
            F.round("rev", 2).cast("double").alias("revenue"),
        )
    )


TPCH_Q5_SQL = """
SELECT n_name AS nation,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1996-01-01'
GROUP BY n_name
"""


# --- EXISTS (correlated) ≡ left-semi join ----------------------------------


def subq_exists_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one returned line, per priority (Q4 shape;
    the fixture lineitem has no commitdate, so the EXISTS predicate is
    a returned-line test).  EXISTS decorrelates to a left-semi join —
    semi stops probing a key after the first match and never duplicates
    the left side, which is exactly EXISTS semantics and cheaper than
    join+distinct at scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SUBQ_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- correlated scalar subquery (Q17) --------------------------------------


def subq_scalar_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-order revenue: lines whose quantity is below 20% of their
    part's average quantity, for one brand.  The correlated scalar
    subquery decorrelates to a per-part aggregate joined back on
    partkey — one extra shuffle over the SAME key as the probe join, so
    AQE can reuse the exchange.  The brand filter reaches the part scan
    and prunes the aggregate to the brand's parts only (filter first,
    aggregate second — at 100 TB aggregating all parts first would be
    the bug)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    thresholds = branded.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_floor")
    )
    return (
        branded.join(
            thresholds,
            (F.col("l_partkey") == F.col("t_partkey"))
            & (F.col("l_quantity") < F.col("qty_floor")),
        )
        .agg(
            F.round(F.sum(_money("l_extendedprice")) / 7, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


SUBQ_SCALAR_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7, 2) AS DOUBLE)
           AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = part.p_partkey)
"""


# --- uncorrelated scalar subquery in HAVING (Q11) --------------------------


def subq_global_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations holding more than 4% of total supplier account balance.
    The global total is a one-row aggregate broadcast-cross-joined onto
    the per-nation totals — the distributed form of an uncorrelated
    scalar subquery (never .collect() it to the driver; keep it in the
    plan so the whole thing stays one job)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_money("s_acctbal")).alias("bal"))
    )
    total = s.agg(F.sum(_money("s_acctbal")).alias("total_bal"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(F.col("bal") > F.col("total_bal") * 0.04)
        .select(
            F.col("n_name").alias("nation"),
            F.round("bal", 2).cast("double").alias("nation_bal"),
            F.round(F.col("bal") / F.col("total_bal"), 6)
            .cast("double")
            .alias("share"),
        )
    )


SUBQ_GLOBAL_SQL = """
WITH per_nation AS (
  SELECT n_name, sum(CAST(s_acctbal AS DECIMAL(18,2))) AS bal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name AS nation,
       CAST(round(bal, 2) AS DOUBLE) AS nation_bal,
       CAST(round(bal / (SELECT sum(CAST(s_acctbal AS DECIMAL(18,2)))
                         FROM supplier), 6) AS DOUBLE) AS share
FROM per_nation
WHERE bal > (SELECT sum(CAST(s_acctbal AS DECIMAL(18,2))) FROM supplier) * 0.04
"""


# --- two-level aggregation over an outer join (Q13) ------------------------


def agg_orders_per_cust_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders-per-customer histogram.  The left outer join keeps
    zero-order customers (count(o_orderkey) counts only matched rows →
    0 for them); the second aggregation is tiny (|distinct counts|
    keys).  First shuffle is the big one and it's on custkey — at
    scale, pre-bucketing customer+orders by custkey removes it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


AGG_CUST_DIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q3_shipping_priority": QuerySpec(tpch_q3_shipping_priority, TPCH_Q3_SQL),
    "tpch_q5_local_revenue": QuerySpec(tpch_q5_local_revenue, TPCH_Q5_SQL),
    "subq_exists_returned": QuerySpec(subq_exists_returned, SUBQ_EXISTS_SQL),
    "subq_scalar_avg_qty": QuerySpec(subq_scalar_avg_qty, SUBQ_SCALAR_SQL),
    "subq_global_fraction": QuerySpec(subq_global_fraction, SUBQ_GLOBAL_SQL),
    "agg_orders_per_cust_dist": QuerySpec(
        agg_orders_per_cust_dist, AGG_CUST_DIST_SQL
    ),
}
