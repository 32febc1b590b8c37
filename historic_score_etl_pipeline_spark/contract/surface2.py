"""Contract batch 7 — second engine-surface widening pass.

Five more physical paths a reference user gets for free from the Spark
lattice, each with a DuckDB oracle:

* ``setop_intersect`` — INTERSECT (the reference only ever unions,
  `app/team_utilities.py:536-544`; intersect completes the set-op trio
  with ``setop_union`` / ``setop_except``).
* ``unpivot_long`` — wide→long reshaping (``df.unpivot`` → Expand), the
  inverse of the reference's positional pivot
  (`app/team_utilities.py:76-88`).
* ``window_ntile`` — quantile bucketing per key with a total-order
  tiebreak (same family as the recency ranking latent in
  `app/team_utilities.py:447`).
* ``agg_mode_median`` — most-frequent value via count + deterministic
  tie-break (NOT ``F.mode``, whose tie choice is engine-specific) plus
  interpolated median per group.
* ``hof_array_pipeline`` — higher-order array functions
  (filter → transform → aggregate) entirely inside codegen, the
  array-native path the engine prefers over exploding 100 TB of rows
  just to re-aggregate them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- set-op trio completion: INTERSECT ------------------------------------

def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped both returned ('R') and accepted ('A')
    lines.  INTERSECT is a distinct-ified semi-match: Catalyst plans one
    hash aggregate per side + a left-semi hash join, all partial-agg'd
    map-side — no row explosion at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.intersect(a)


SETOP_INTERSECT_SQL = """
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
"""


# --- wide→long unpivot -----------------------------------------------------

def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part measures unpivoted to (metric, val) long format.  ``unpivot``
    is a zero-shuffle Expand (each input row emits one row per measure),
    so it scales linearly — the engine's inverse of the positional pivot
    parser (`parse_token_records`)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


UNPIVOT_LONG_SQL = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
"""


# --- ntile quantile bucketing ----------------------------------------------

def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucket of each order within its priority class.  ntile
    needs a TOTAL order (o_totalprice ties broken by o_orderkey) or the
    bucket boundary rows are nondeterministic across engines."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
    )


WINDOW_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
FROM orders
"""


# --- mode + median per group -----------------------------------------------

def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent event value bucket and median raw value per
    event_type.  Mode is computed as count + row_number with an explicit
    smallest-value tie-break — ``F.mode`` leaves ties engine-defined, so
    it can never be oracle-checked.  Two-level agg keeps both passes
    map-side partial; median (exact interpolated) sorts within groups."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 10).cast("bigint").alias("bucket")
    counts = ev.select("event_type", bucket).groupBy("event_type", "bucket").count()
    w = Window.partitionBy("event_type").orderBy(
        F.col("count").desc(), F.col("bucket")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("bucket").alias("mode_bucket"))
    )
    medians = ev.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("median_value")
    )
    return modes.join(medians, "event_type")


AGG_MODE_MEDIAN_SQL = """
WITH counts AS (
  SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bucket, count(*) AS c
  FROM events GROUP BY 1, 2
),
modes AS (
  SELECT event_type, bucket AS mode_bucket
  FROM (SELECT event_type, bucket,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, bucket) AS rn
        FROM counts)
  WHERE rn = 1
)
SELECT m.event_type, m.mode_bucket,
       round(median(e.value), 6) AS median_value
FROM modes m JOIN events e ON m.event_type = e.event_type
GROUP BY m.event_type, m.mode_bucket
"""


# --- higher-order array pipeline -------------------------------------------

def hof_array_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line-quantity array processed with higher-order
    functions: filter (qty > 25) → transform (square) → aggregate (sum),
    plus the filtered count.  The whole chain is one codegen'd projection
    over the collected array — at 100 TB this beats explode + re-groupBy
    (which would double-shuffle) whenever per-key arrays are bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    big = F.filter(F.col("qtys"), lambda q: q > 25)
    return arr.select(
        "l_orderkey",
        F.size("qtys").cast("bigint").alias("n_lines"),
        F.size(big).cast("bigint").alias("n_big"),
        F.round(
            F.aggregate(
                F.transform(big, lambda q: q * q),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum_sq_big"),
    )


HOF_ARRAY_PIPELINE_SQL = """
WITH arrs AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(qtys) AS n_lines,
       len(list_filter(qtys, q -> q > 25)) AS n_big,
       round(coalesce(list_sum(
           list_transform(list_filter(qtys, q -> q > 25), q -> q * q)
       ), 0.0), 6) AS sum_sq_big
FROM arrs
"""


QUERIES: dict[str, QuerySpec] = {
    "setop_intersect": QuerySpec(setop_intersect, SETOP_INTERSECT_SQL),
    "unpivot_long": QuerySpec(unpivot_long, UNPIVOT_LONG_SQL),
    "window_ntile": QuerySpec(window_ntile, WINDOW_NTILE_SQL),
    "agg_mode_median": QuerySpec(agg_mode_median, AGG_MODE_MEDIAN_SQL),
    "hof_array_pipeline": QuerySpec(hof_array_pipeline, HOF_ARRAY_PIPELINE_SQL),
}
