"""Contract batch 15 — modern SQL-engine surface: recursive CTEs,
VARIANT semi-structured data, ORC ingest, batch sessionization, and
runtime Bloom-filter join pruning.

* ``sql_recursive_cte`` — ORACLE-CHECKED ``WITH RECURSIVE`` (Spark 4.x)
  ancestor-chain enumeration: variable-depth iteration expressed
  declaratively, checked against DuckDB's recursive CTE.  This is the
  SQL twin of the engine's iterative operators (connected components,
  k-means) — same fixpoint semantics, now parser-level.
* ``json_variant`` — ORACLE-CHECKED semi-structured path: JSON strings
  parsed into Spark's VARIANT type (``parse_json``/``variant_get``),
  filtered and aggregated without ever materializing a rigid struct
  schema.  The reference round-trips nested data through JSON strings
  (``app/team_utilities.py:89,107,124``; ``app/ref_utilities.py:170``);
  VARIANT is the engine's scale answer: binary-encoded, pushdown-capable
  shredded access instead of per-row string re-parsing.
* ``scan_orc`` — ORACLE-CHECKED second columnar format: documents
  staged to ORC, read back, aggregated; proves ingest parity across
  parquet/CSV/JSON/ORC.
* ``sessionize_batch`` — ORACLE-CHECKED gaps-and-islands sessionization
  (lag → gap flag → cumulative-sum island id), the batch twin of the
  rows-only ``stream_session_gap``.  One shuffle (by user), both
  windows share the same partitioning.
* ``join_bloom_prune`` — ORACLE-CHECKED join with Spark's runtime
  Bloom-filter injection forced on: the selective dimension side builds
  a Bloom filter that prunes fact rows *before* the shuffle (the
  100 TB-scale mechanism for cutting shuffle volume on selective
  joins).  Result is config-independent — checked against the plain
  join oracle; the plan assertion lives in tests/test_surface10.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- recursive CTE -----------------------------------------------------------


def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor chains of a synthetic customer hierarchy where
    parent(k) = k div 10 (variable depth, terminates at 0).  Pure
    ``spark.sql`` with WITH RECURSIVE — each iteration is one
    distributed join+union step under the hood; the UnionLoop stops
    when the step frontier is empty."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer_rec"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain(c_custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey, 0
          FROM v_customer_rec WHERE c_custkey <= 300
          UNION ALL
          SELECT c_custkey, anc div 10, depth + 1
          FROM chain WHERE anc > 0
        )
        SELECT c_custkey, anc AS ancestor, depth FROM chain
        """
    )


SQL_RECURSIVE_SQL = """
WITH RECURSIVE chain(c_custkey, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 300
  UNION ALL
  SELECT c_custkey, anc // 10, depth + 1 FROM chain WHERE anc > 0
)
SELECT c_custkey, anc AS ancestor, depth FROM chain
"""


# --- VARIANT -----------------------------------------------------------------


def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props (a JSON string column) parsed once into VARIANT,
    then path-extracted with variant_get — typed access into
    semi-structured data with no declared struct schema.  At scale the
    parse happens once at ingest and lands as a VARIANT parquet column;
    every later query shreds just the paths it touches."""
    ev = load_table(spark, sf_dir, "events")
    # try_ variants end-to-end: parse_json THROWS on malformed JSON and
    # variant_get THROWS on an uncastable path (e.g. $.k holding a nested
    # object) — dirty props must shred to NULL, not fail the job
    v = ev.withColumn("v", F.try_parse_json(F.col("props")))
    return (
        v.withColumn(
            # 'bigint', not 'int': an int32-overflowing numeric k would
            # NULL out in Spark while DuckDB's BIGINT keeps it
            "k", F.expr("try_variant_get(v, '$.k', 'bigint')")
        )
        .where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hot"),
            F.sum("k").alias("sum_k"),
        )
    )


JSON_VARIANT_SQL = """
WITH base AS (
  SELECT event_type,
         -- trunc(DOUBLE): Spark's variant double->bigint TRUNCATES
         -- (60.5 -> 60) while DuckDB's VARCHAR->BIGINT cast ROUNDS
         -- (60.5 -> 61); the double round-trip is exact for |k| < 2^53
         TRY_CAST(trunc(TRY_CAST(json_extract_string(
             CASE WHEN json_valid(props) THEN props END,
             '$.k') AS DOUBLE)) AS BIGINT)
           AS k
  FROM events
)
SELECT event_type, count(*) AS n_hot, CAST(sum(k) AS BIGINT) AS sum_k
FROM base WHERE k > 50 GROUP BY event_type
"""


# --- ORC ingest --------------------------------------------------------------


def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents staged to ORC then scanned back: the engine's ingest
    surface is format-plural (parquet/CSV/JSON/ORC) behind the same
    DataFrame reader, with identical pushdown semantics.  The staging
    write is deterministic (same rows, any partitioning), so the
    aggregate below hash-matches the oracle run on the parquet."""
    docs = load_table(spark, sf_dir, "documents")
    target = os.path.join(
        tempfile.mkdtemp(prefix="scan_orc_"), "documents_orc"
    )
    docs.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    return (
        back.where(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SCAN_ORC_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars > 0 GROUP BY lang
"""


# --- batch sessionization ----------------------------------------------------

_GAP_S = 12 * 3600  # session break: >12h inactivity


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: per user, a new session starts
    where the inter-event gap exceeds 12 h; the island id is the
    running sum of the start flags.  Both windows partition by user —
    one shuffle total, AQE-coalesced.  Timestamps surface as strings
    (driver-hash gotcha: pandas renders TIMESTAMP columns differently
    across engines)."""
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer MICROSECONDS on both sides: a seconds-truncating cast
    # disagrees with DuckDB's fractional epoch() exactly at the gap
    # boundary (first seen at sf0.1: one 43200.23 s gap)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(
        order
    )
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > _GAP_S * 1_000_000), 1).otherwise(0),
    )
    with_id = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("string").alias("session_start"),
            F.max("ts").cast("string").alias("session_end"),
            F.sum("value").cast("double").alias("session_value"),
        )
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
with_id AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       CAST(min(ts) AS VARCHAR) AS session_start,
       CAST(max(ts) AS VARCHAR) AS session_end,
       CAST(sum(value) AS DOUBLE) AS session_value
FROM with_id GROUP BY user_id, session_id
"""


# --- runtime Bloom-filter join pruning ---------------------------------------


def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim⋈fact join with Spark's runtime Bloom-filter
    injection forced on (thresholds dropped to 0 so the local fixture
    triggers what a 100 TB fact table triggers naturally): the filtered
    orders side publishes a Bloom filter on o_orderkey, the lineitem
    scan applies might_contain() *before* shuffling, so only matching
    fact rows move.  Results are identical with the filter off — the
    oracle is the plain join."""
    # InjectRuntimeFilter only fires on a *probable shuffle* join, so a
    # fixture-sized dim (broadcastable) never triggers it.  Force the
    # shuffle-join conditions while this plan is optimized, then restore
    # every conf so nothing leaks into later queries in the session: the
    # physical plan is forced (and memoized by QueryExecution) before the
    # confs roll back.
    _confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in _confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1999-07-01").cast("date"))
        )
        rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
        out = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            )
        )
        # Lock the plan in under the forced confs (QueryExecution memoizes).
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


JOIN_BLOOM_SQL = """
SELECT l_linestatus, count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= DATE '1999-01-01' AND o_orderdate < DATE '1999-07-01'
GROUP BY l_linestatus
"""


QUERIES: dict[str, QuerySpec] = {
    "sql_recursive_cte": QuerySpec(sql_recursive_cte, SQL_RECURSIVE_SQL),
    "json_variant": QuerySpec(json_variant, JSON_VARIANT_SQL),
    "scan_orc": QuerySpec(scan_orc, SCAN_ORC_SQL),
    "sessionize_batch": QuerySpec(sessionize_batch, SESSIONIZE_SQL),
    "join_bloom_prune": QuerySpec(join_bloom_prune, JOIN_BLOOM_SQL),
}
