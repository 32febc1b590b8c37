"""Contract batch 2 — aggregations + JSON boundary (SURVEY.md §2C-C9/C10,
§2D D1-D6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.functions.json_fns import (
    json_extract_string,
    struct_to_json,
)
from historic_score_etl_pipeline_spark.operators.aggregates import (
    decimal_sum_double,
    pivot_collect_csv,
    sorted_collect_csv,
    sorted_collect_json,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- C9: struct → JSON at the sink boundary -------------------------------

def json_collect_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed struct serialized to JSON only at the boundary
    (app/team_utilities.py:89,107,124 ``json.dumps``)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        struct_to_json(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("doc_json"),
    )


JSON_COLLECT_STRUCT_SQL = """
SELECT o_orderkey,
       CAST(to_json(struct_pack(key := o_orderkey, status := o_orderstatus,
                                prio := o_orderpriority)) AS VARCHAR) AS doc_json
FROM orders
"""


# --- C10: JSON string → typed value ---------------------------------------

def json_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSONB-ish props column (app/ref_utilities.py:170-172
    ``json.loads``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        json_extract_string("props", "$.k").try_cast("int").alias("k_val"),
    )


JSON_PARSE_EXTRACT_SQL = """
-- json_valid guard: DuckDB's json_extract THROWS on malformed JSON where
-- Spark's get_json_object returns NULL — route invalid/NULL props to NULL
-- integer-string guard: Spark's try_cast(VARCHAR as INT) rejects
-- '60.5' (NULL) where DuckDB's TRY_CAST ROUNDS it to 61, but ACCEPTS a
-- leading '+' and [\\x00-\\x20]-padded strings (UTF8String.trimAll) —
-- strip that exact set, then require an optional-sign integer
WITH raw AS (
  SELECT event_id,
         regexp_replace(json_extract_string(
           CASE WHEN json_valid(props) THEN props END, '$.k'),
           '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS ks
  FROM events
)
SELECT event_id,
       TRY_CAST(CASE WHEN regexp_matches(ks, '^[+-]?[0-9]+$')
                THEN ks END AS INTEGER) AS k_val
FROM raw
"""


# --- D1: group → sorted collect_list --------------------------------------

def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature dict-bucket aggregation
    (app/team_utilities.py:277-288): minutes-per-activity becomes
    lines-per-order; sorted for determinism, csv for engine-neutral
    hashing."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sorted_collect_csv("l_linenumber").alias("lines_csv"))
    )


AGG_COLLECT_LIST_SQL = """
SELECT l_orderkey,
       array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv
FROM lineitem GROUP BY l_orderkey
"""


# --- D2: wide pivot of collect_lists --------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def agg_pivot_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-key activity pivot (app/team_utilities.py:284-286) with
    explicit pivot values — no distinct-values pre-job, static plan.

    Empty-cell semantics PINNED to '' (the reference's fixed-key dict
    holds an empty list, not an absence): Spark's pivot with explicit
    values aggregates ZERO rows for a missing (user, type) cell —
    collect_list → [] → array_join → '' — while DuckDB's FILTER list()
    is NULL there; the oracle coalesces to match.  Latent until the r10
    adversarial many-distinct-users wave added users with exactly ONE
    event type (every earlier user had all five)."""
    ev = load_table(spark, sf_dir, "events")
    return pivot_collect_csv(
        ev, "user_id", "event_type", _EVENT_TYPES, "event_id"
    )


AGG_PIVOT_ACTIVITY_SQL = """
SELECT user_id,
       COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type = 'click')), ','), '') AS click_ids,
       COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type = 'error')), ','), '') AS error_ids,
       COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type = 'purchase')), ','), '') AS purchase_ids,
       COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type = 'signup')), ','), '') AS signup_ids,
       COALESCE(array_to_string(list_sort(list(event_id) FILTER (event_type = 'view')), ','), '') AS view_ids
FROM events GROUP BY user_id
"""


# --- D3: collect array-of-structs -----------------------------------------

def agg_collect_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-structs per key — the engine's typed replacement for the
    reference's dict-of-parallel-arrays (app/ref_utilities.py:173,
    app/team_utilities.py:74-89); JSON only in the final projection."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        sorted_collect_json(
            F.col("l_linenumber").alias("line"),
            F.col("l_partkey").alias("part"),
            F.col("l_returnflag").alias("flag"),
        ).alias("lines_json")
    )


AGG_COLLECT_STRUCT_SQL = """
SELECT l_orderkey,
       CAST(to_json(list_sort(list(struct_pack(line := l_linenumber,
                                               part := l_partkey,
                                               flag := l_returnflag)))) AS VARCHAR)
         AS lines_json
FROM lineitem GROUP BY l_orderkey
"""


# --- D4: string-concat aggregation ----------------------------------------

def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-report folding (app/main.py:24-36): per-language report of
    source:doc_id lines, newline-joined in sorted order."""
    docs = load_table(spark, sf_dir, "documents")
    line = F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))
    return (
        docs.withColumn("line", line)
        .groupBy("lang")
        .agg(sorted_collect_csv("line", "\n").alias("report"))
    )


AGG_STRING_CONCAT_SQL = """
SELECT lang,
       string_agg(line, chr(10) ORDER BY line) AS report
FROM (SELECT lang, source || ':' || CAST(doc_id AS VARCHAR) AS line FROM documents)
GROUP BY lang
"""


# --- D5: count per group --------------------------------------------------

def agg_count_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-league row counts (app/team_utilities.py:438 ``len(...)``)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


AGG_COUNT_GROUP_SQL = """
SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
"""


# --- D6a: sum/avg (TPC-H Q1 shape, decimal-exact) -------------------------

def agg_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: DECIMAL-exact sums (order-independent on any
    cluster size), ratios derived from exact sums then rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum_double("l_quantity").alias("sum_qty"),
            decimal_sum_double("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.round(F.col("sum_qty") / F.col("count_order"), 6))
        .withColumn(
            "avg_price", F.round(F.col("sum_base_price") / F.col("count_order"), 6)
        )
    )
    return out


AGG_SUM_AVG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --- D6b: distinct aggregation --------------------------------------------

def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (surface proof; at 100 TB prefer
    approx_count_distinct, covered in the ops library)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


AGG_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part
FROM lineitem GROUP BY l_returnflag
"""


# --- D6c: rollup ----------------------------------------------------------

def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; NULL grouping slots surfaced as 'ALL' so the
    result is engine-neutral."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            decimal_sum_double("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


AGG_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


QUERIES: dict[str, QuerySpec] = {
    "json_collect_struct": QuerySpec(json_collect_struct, JSON_COLLECT_STRUCT_SQL),
    "json_parse_extract": QuerySpec(json_parse_extract, JSON_PARSE_EXTRACT_SQL),
    "agg_collect_list": QuerySpec(agg_collect_list, AGG_COLLECT_LIST_SQL),
    "agg_pivot_activity": QuerySpec(agg_pivot_activity, AGG_PIVOT_ACTIVITY_SQL),
    "agg_collect_struct": QuerySpec(agg_collect_struct, AGG_COLLECT_STRUCT_SQL),
    "agg_string_concat": QuerySpec(agg_string_concat, AGG_STRING_CONCAT_SQL),
    "agg_count_group": QuerySpec(agg_count_group, AGG_COUNT_GROUP_SQL),
    "agg_sum_avg": QuerySpec(agg_sum_avg, AGG_SUM_AVG_SQL),
    "agg_distinct": QuerySpec(agg_distinct, AGG_DISTINCT_SQL),
    "agg_rollup": QuerySpec(agg_rollup, AGG_ROLLUP_SQL),
}
