"""Contract batch 3 — joins, set operations, sort/limit (SURVEY.md §2E,
§2F, §2G)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.aggregates import decimal_sum_double
from historic_score_etl_pipeline_spark.operators.joins import (
    left_enrich,
    theta_contains_join,
    zip_index_join,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- E1: positional zip join ----------------------------------------------

def join_zip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip(clean, id_match) positional alignment
    (app/team_utilities.py:418-420) — row_number on both sides, equi-join
    on the index."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return zip_index_join(cust, supp, ["c_custkey"], ["s_suppkey"]).select(
        "zip_idx", "c_custkey", "s_suppkey"
    )


JOIN_ZIP_INDEX_SQL = """
SELECT l.zip_idx, l.c_custkey, r.s_suppkey
FROM (SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS zip_idx FROM customer) l
JOIN (SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) AS zip_idx FROM supplier) r
  USING (zip_idx)
"""


# --- E2: left-enrichment join with sentinel defaults ----------------------

def join_left_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-details-or-'{}' loops (app/team_utilities.py:448-506) as one
    broadcast left join + coalesce sentinels.  The detail side is
    restricted so some fixtures genuinely miss (E4 sentinel path)."""
    orders = load_table(spark, sf_dir, "orders")
    details = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    out = left_enrich(
        orders,
        details,
        orders.o_custkey == details.c_custkey,
        {"c_name": "", "c_mktsegment": "{}"},
    )
    return out.select(
        "o_orderkey",
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


JOIN_LEFT_ENRICH_SQL = """
SELECT o_orderkey,
       coalesce(c_name, '') AS cust_name,
       coalesce(c_mktsegment, '{}') AS segment
FROM orders
LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer
           WHERE c_acctbal > 5000) d
  ON o_custkey = d.c_custkey
"""


# --- E3: multi-hop enrichment chain ---------------------------------------

def join_multi_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The referee 3-hop chain (app/ref_utilities.py:113-199) as a join
    chain orders→customer→nation→region, dims broadcast, aggregated per
    region."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            decimal_sum_double("o_totalprice").alias("revenue"),
        )
    )


JOIN_MULTI_HOP_SQL = """
SELECT r_name, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- E4a: semi join -------------------------------------------------------

def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that do have completed orders — the reference encodes
    this as skip-if-sentinel (app/ref_utilities.py:162-163); made an
    explicit left_semi."""
    customer = load_table(spark, sf_dir, "customer")
    finished = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    return customer.join(
        finished, customer.c_custkey == finished.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


# --- E4b: anti join -------------------------------------------------------

def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value orders — the ''-sentinel rows made an
    explicit left_anti."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 150000
    )
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


# --- E5: theta containment join -------------------------------------------

def join_theta_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``team in home_teamname`` substring predicate
    (app/team_utilities.py:253-258): documents ⋈ token dim on containment.
    Token side is a handful of rows → BroadcastNestedLoopJoin."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        load_table(spark, sf_dir, "part")
        .select(F.substring_index("p_name", " ", 1).alias("tok"))
        .distinct()
    )
    return theta_contains_join(docs, tokens, "text", "tok").select("doc_id", "tok")


JOIN_THETA_CONTAINS_SQL = """
SELECT doc_id, tok
FROM documents
JOIN (SELECT DISTINCT split_part(p_name, ' ', 1) AS tok FROM part) t
  ON strpos(text, tok) > 0
"""


# --- E6a: bulk hash equi-join ---------------------------------------------

def join_hash_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact equi-join (absent in the reference, §2E-E6): lineitem ⋈
    orders on the order key — SortMergeJoin/shuffled hash under AQE —
    aggregated per priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            decimal_sum_double("l_extendedprice").alias("revenue"),
        )
    )


JOIN_HASH_EQUI_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- E6b: as-of join (latest prior event) ---------------------------------

def join_asof_lastn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: for each purchase event, the most recent prior click by the
    same user (the reference's latent "last matches before fixture date",
    app/team_utilities.py:447).  Runs on the DEFAULT as-of plan —
    :func:`operators.joins.asof_backward_join`'s one-shuffle union-merge —
    so no purchase × all-prior-clicks intermediate ever materializes;
    purchases with no prior click keep NULL (left as-of).  The oracle below
    states the naive conditional-join formulation; hash-match proves the
    merge plan equivalent."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_backward_join,
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
    return asof_backward_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        payload_cols=["click_id"],
        right_tiebreak="click_id",
    ).select("purchase_id", "user_id", "click_id")


JOIN_ASOF_LASTN_SQL = """
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
) WHERE rn = 1
"""


# --- F1: union all --------------------------------------------------------

def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salvage-frame union (app/team_utilities.py:536-544 ``pd.concat``):
    two order subsets, UNION ALL semantics (duplicates kept)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus"
    )
    b = orders.where(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_orderstatus"
    )
    return a.unionByName(b)


SETOP_UNION_SQL = """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000
"""


# --- F2: except -----------------------------------------------------------

def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL surface proof (absent in the reference, §2F-F2)."""
    customer = load_table(spark, sf_dir, "customer")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    negative = customer.where(F.col("c_acctbal") < 0).select("c_custkey")
    return building.exceptAll(negative)


SETOP_EXCEPT_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


# --- G1: ordered top-N ----------------------------------------------------

def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``elements[:5]`` limit (app/team_utilities.py:197) with an explicit
    total order: top 10 orders by price, key tiebreak.  Catalyst turns
    this into TakeOrderedAndProject — no global sort materialized."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SORT_LIMIT_TOPN_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


QUERIES: dict[str, QuerySpec] = {
    "join_zip_index": QuerySpec(join_zip_index, JOIN_ZIP_INDEX_SQL),
    "join_left_enrich": QuerySpec(join_left_enrich, JOIN_LEFT_ENRICH_SQL),
    "join_multi_hop": QuerySpec(join_multi_hop, JOIN_MULTI_HOP_SQL),
    "join_semi": QuerySpec(join_semi, JOIN_SEMI_SQL),
    "join_anti": QuerySpec(join_anti, JOIN_ANTI_SQL),
    "join_theta_contains": QuerySpec(join_theta_contains, JOIN_THETA_CONTAINS_SQL),
    "join_hash_equi": QuerySpec(join_hash_equi, JOIN_HASH_EQUI_SQL),
    "join_asof_lastn": QuerySpec(join_asof_lastn, JOIN_ASOF_LASTN_SQL),
    "setop_union": QuerySpec(setop_union, SETOP_UNION_SQL),
    "setop_except": QuerySpec(setop_except, SETOP_EXCEPT_SQL),
    "sort_limit_topn": QuerySpec(sort_limit_topn, SORT_LIMIT_TOPN_SQL),
}
