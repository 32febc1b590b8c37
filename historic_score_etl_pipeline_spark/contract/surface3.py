"""Contract batch 8 — third engine-surface widening pass.

Seven more physical paths, each DuckDB-oracle-checked:

* ``date_spine_gapfill`` — time-series gap filling: generate a dense
  per-day date spine (``sequence`` + ``explode``) and left-join sparse
  daily aggregates onto it, zero-filling missing days.  This is the
  hypertable-rollup shape the reference approximates by scraping a
  pre-densified page per day (`app/team_utilities.py:436` filters a
  2-day horizon; a warehouse needs the dense calendar).
* ``agg_filter_where`` — conditional aggregation (FILTER/CASE inside
  the aggregate): one scan produces per-group metrics over different
  predicates, instead of N filtered scans unioned.
* ``join_fuzzy_levenshtein`` — edit-distance theta-join over a small
  distinct dimension (the scale-safe fuzzy-match shape: dedupe to the
  distinct key set FIRST, then the quadratic comparison runs on |keys|²
  not |rows|²).  Same family as the reference's substring theta-join
  (`app/team_utilities.py:253-258`).
* ``window_percent_rank`` — relative-rank analytics (percent_rank +
  cume_dist) with a total-order tiebreak.
* ``agg_collect_set`` — distinct-collect (set semantics) rendered as a
  sorted CSV for engine-neutral hashing.
* ``window_first_last`` — first_value/last_value over an explicit
  full-partition frame (the default frame stops at CURRENT ROW and
  makes last_value a silent bug; the engine always states the frame).
* ``sample_key_mod`` — deterministic key-mod sampling: the dev-loop
  pattern for iterating on 100 TB (a stable 5% slice by key hash keeps
  every line of an order together, unlike row-level Bernoulli sampling
  which shears multi-row entities and is engine-seeded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.aggregates import sorted_collect_csv
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- time-series gap fill over a generated date spine ----------------------

def date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily order counts per priority class.  The spine is built
    from the global min/max date (one tiny agg), cross-joined with the
    distinct priority set — both sides are broadcast-sized by
    construction, so the only real shuffle is the daily groupBy; the
    grid⋈daily join broadcasts the grid at any data scale because the
    grid grows with |days|×|priorities|, not with |rows|."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    grid = o.select("prio").distinct().crossJoin(spine)
    daily = (
        o.groupBy("prio", "d")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("prio").alias("d_prio"), "d", "n")
    )
    return (
        grid.join(
            F.broadcast(daily),
            (F.col("prio") == F.col("d_prio")) & (F.col("day") == F.col("d")),
            "left",
        )
        .select(
            "prio",
            F.col("day").cast("string").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


DATE_SPINE_GAPFILL_SQL = """
WITH o AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT min(d) AS min_d, max(d) AS max_d FROM o)
),
grid AS (SELECT prio, day FROM (SELECT DISTINCT prio FROM o) CROSS JOIN spine),
daily AS (SELECT prio, d, count(*) AS n FROM o GROUP BY prio, d)
SELECT g.prio, CAST(g.day AS VARCHAR) AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
FROM grid g LEFT JOIN daily ON g.prio = daily.prio AND g.day = daily.d
"""


# --- conditional aggregation (FILTER / CASE inside the aggregate) ----------

def agg_filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-linestatus metrics over three different predicates in ONE
    scan: returned-line count, high-discount revenue, and tax-free
    quantity.  Conditional aggregates keep this a single map-side
    partial agg; the naive alternative (three filtered scans joined
    back) reads the fact table three times."""
    li = load_table(spark, sf_dir, "lineitem")
    money = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, money).otherwise(F.lit(0))),
            2,
        ).cast("double").alias("hi_disc_revenue"),
        F.round(
            F.sum(F.when(F.col("l_tax") == 0, F.col("l_quantity"))), 2
        ).alias("taxfree_qty"),
    )


AGG_FILTER_WHERE_SQL = """
SELECT l_linestatus,
       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       CAST(round(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           FILTER (WHERE l_discount > 0.05), 0), 2) AS DOUBLE)
           AS hi_disc_revenue,
       round(sum(l_quantity) FILTER (WHERE l_tax = 0), 2) AS taxfree_qty
FROM lineitem GROUP BY l_linestatus
"""


# --- fuzzy (edit-distance) matching over a distinct dimension ---------------

def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical brand pairs by Levenshtein distance ≤ 2.  The
    quadratic comparison runs AFTER a distinct() on the ~25-value brand
    dimension, so the cross join is |brands|² regardless of fact-table
    size — the only scale-safe way to fuzzy-join without LSH.  The
    a < b guard halves the work and drops self-pairs."""
    brands = (
        load_table(spark, sf_dir, "part").select(F.col("p_brand").alias("b")).distinct()
    )
    left = brands.select(F.col("b").alias("brand_a"))
    right = brands.select(F.col("b").alias("brand_b"))
    return (
        left.join(F.broadcast(right), F.col("brand_a") < F.col("brand_b"))
        .withColumn("edit_dist", F.levenshtein("brand_a", "brand_b").cast("int"))
        .where(F.col("edit_dist") <= 2)
    )


JOIN_FUZZY_LEVENSHTEIN_SQL = """
WITH brands AS (SELECT DISTINCT p_brand AS b FROM part)
SELECT a.b AS brand_a, bb.b AS brand_b,
       CAST(levenshtein(a.b, bb.b) AS INTEGER) AS edit_dist
FROM brands a JOIN brands bb ON a.b < bb.b
WHERE levenshtein(a.b, bb.b) <= 2
"""


# --- relative-rank analytics ------------------------------------------------

def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of each customer's balance within their
    market segment.  Total order (acctbal, custkey) makes both ranks
    engine-deterministic; rounding absorbs double formatting drift."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_PERCENT_RANK_SQL = """
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey), 6) AS cume
FROM customer
"""


# --- distinct-collect (set semantics) ---------------------------------------

def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct return-flag set per order as a sorted CSV.  collect_set
    dedups inside the partial aggregate (map-side), so the shuffle
    carries only distinct values per key — at 100 TB that is the
    difference between shipping every line and shipping ≤3 flags."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias(
            "flags_csv"
        ),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


AGG_COLLECT_SET_SQL = """
SELECT l_orderkey,
       array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags_csv,
       count(DISTINCT l_returnflag) AS n_flags
FROM lineitem GROUP BY l_orderkey
"""


# --- first/last value over an explicit full frame ---------------------------

def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-shipped part per order.  The frame is stated
    explicitly (UNBOUNDED PRECEDING → UNBOUNDED FOLLOWING): the SQL
    default frame ends at CURRENT ROW, which silently turns last_value
    into "current value" — a classic cross-engine mismatch the contract
    pins down.  The synthetic lineitem re-uses linenumbers within an
    order, so the total-order tiebreak must include the payload column
    itself (shipdate, linenumber, partkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(F.col("l_shipdate"), F.col("l_linenumber"), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT l_orderkey, l_linenumber,
       first_value(l_partkey) OVER w AS first_part,
       last_value(l_partkey) OVER w AS last_part
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- deterministic key-mod sampling -----------------------------------------

def sample_key_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A stable 5% order slice: keep orders where o_orderkey % 20 == 0,
    then aggregate the sampled lines.  Key-mod sampling is the dev-loop
    workhorse at scale: deterministic across runs/engines (unlike
    seeded Bernoulli), entity-coherent (a sampled order keeps ALL its
    lines), and pushed down to the scan as a cheap predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.where(F.col("l_orderkey") % 20 == 0)
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_quantity")), 2).alias("sum_qty"),
    )


SAMPLE_KEY_MOD_SQL = """
SELECT l_returnflag, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem WHERE l_orderkey % 20 = 0
GROUP BY l_returnflag
"""


QUERIES: dict[str, QuerySpec] = {
    "date_spine_gapfill": QuerySpec(date_spine_gapfill, DATE_SPINE_GAPFILL_SQL),
    "agg_filter_where": QuerySpec(agg_filter_where, AGG_FILTER_WHERE_SQL),
    "join_fuzzy_levenshtein": QuerySpec(
        join_fuzzy_levenshtein, JOIN_FUZZY_LEVENSHTEIN_SQL
    ),
    "window_percent_rank": QuerySpec(window_percent_rank, WINDOW_PERCENT_RANK_SQL),
    "agg_collect_set": QuerySpec(agg_collect_set, AGG_COLLECT_SET_SQL),
    "window_first_last": QuerySpec(window_first_last, WINDOW_FIRST_LAST_SQL),
    "sample_key_mod": QuerySpec(sample_key_mod, SAMPLE_KEY_MOD_SQL),
}
