"""Contract batch 13 — dedup clustering (connected components), SCD
Type 2 dimension history, and corpus TF-IDF.

* ``dedup_connected_components`` — ORACLE-CHECKED iterative graph
  algorithm: candidate pairs → duplicate clusters via min-label
  propagation; the DuckDB twin computes the same transitive closure
  with a recursive CTE, so the distributed loop is checked against a
  declarative fixpoint, not against itself.  (Pairs here come from the
  lineitem co-occurrence graph — the same operator consumes MinHash/LSH
  pair output unchanged.)
* ``sink_scd2_history`` — ORACLE-CHECKED SCD2: apply a segment-change
  batch to a customer dimension TWICE (retry), hash-match the full
  resulting history (closed rows, opened rows, untouched keys) against
  the SQL statement of the expected table.
* ``text_tfidf_topk`` — ORACLE-CHECKED corpus-level TF-IDF with top-3
  terms per document: tokenize → TF per (doc, term) → DF per term →
  ln(N/df) → windowed top-k with a total-order tiebreak.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.graph import connected_components
from historic_score_etl_pipeline_spark.sinks.merge import scd2_apply
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- connected components ----------------------------------------------------

_SUPP_OFFSET = 1_000_000  # disjoint node-id namespaces: parts vs suppliers


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the part/supplier co-occurrence graph (edges: a lineitem
    with quantity > 45 links its part to its supplier).  Returns every
    node with its component's canonical (minimum) id — exactly what a
    dedup pipeline does to elect one survivor per duplicate cluster."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
    ).distinct()
    return (
        connected_components(edges)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("comp").cast("long").alias("component"),
        )
    )


DEDUP_CC_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT l_partkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst
  FROM lineitem WHERE l_quantity > 45
),
sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
),
reach AS (
  SELECT a AS node, a AS comp FROM sym
  UNION
  SELECT s.b AS node, reach.comp
  FROM reach JOIN sym s ON reach.node = s.a
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(comp) AS BIGINT) AS component
FROM reach GROUP BY node
"""


# --- SCD Type 2 ---------------------------------------------------------------


def sink_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension loaded as of 1995-01-01; every 7th customer
    migrates to segment 'MIGRATED' effective 2000-01-01.  The change
    batch is applied twice — the second application must be a no-op.
    Output: the complete version history."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    target = tempfile.mkdtemp(prefix="scd2_target_") + "/dim_customer"
    initial = c.withColumn(
        "effective_date", F.lit("1995-01-01").cast("date")
    )
    scd2_apply(spark, target, initial, ["c_custkey"], ["c_mktsegment"])
    changes = (
        c.where(F.col("c_custkey") % 7 == 0)
        .withColumn("c_mktsegment", F.lit("MIGRATED"))
        .withColumn("effective_date", F.lit("2000-01-01").cast("date"))
    )
    scd2_apply(spark, target, changes, ["c_custkey"], ["c_mktsegment"])
    scd2_apply(spark, target, changes, ["c_custkey"], ["c_mktsegment"])  # retry
    return spark.read.parquet(target).select(
        "c_custkey",
        "c_mktsegment",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.coalesce(F.col("valid_to").cast("string"), F.lit("open")).alias(
            "valid_to"
        ),
        F.col("is_current").cast("int").alias("is_current"),
    )


SINK_SCD2_SQL = """
SELECT c_custkey, c_mktsegment,
       '1995-01-01' AS valid_from,
       CASE WHEN c_custkey % 7 = 0 THEN '2000-01-01' ELSE 'open' END AS valid_to,
       CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END AS is_current
FROM customer
UNION ALL
SELECT c_custkey, 'MIGRATED' AS c_mktsegment,
       '2000-01-01' AS valid_from, 'open' AS valid_to, 1 AS is_current
FROM customer WHERE c_custkey % 7 = 0
"""


# --- TF-IDF -------------------------------------------------------------------


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document over the whole corpus.  One
    explode for TF, one tiny DF aggregate joined back (|vocab| rows —
    broadcast), idf = ln(N/df); deterministic top-k via (score desc,
    term asc).  Scores rounded to 6 dp so both engines' libm agree."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar; at scale keep as a broadcast 1-row DF
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", F.col("tfidf").cast("double"))
    )


TEXT_TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> ''
  GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / df.df), 6)
             AS tfidf
  FROM tf JOIN df ON tf.term = df.term
),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, CAST(tfidf AS DOUBLE) AS tfidf
FROM ranked WHERE rank <= 3
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_connected_components": QuerySpec(
        dedup_connected_components, DEDUP_CC_SQL
    ),
    "sink_scd2_history": QuerySpec(sink_scd2_history, SINK_SCD2_SQL),
    "text_tfidf_topk": QuerySpec(text_tfidf_topk, TEXT_TFIDF_SQL),
}
