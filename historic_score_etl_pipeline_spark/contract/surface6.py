"""Contract batch 11 — sink MERGE semantics, skew-split join, and the
stream-stream interval join, each run genuinely end-to-end.

The reference's sink is blind append with retries
(``app/team_utilities.py:363-365,510-554``): a retried league duplicates
rows.  ``sink_merge_upsert`` proves the engine's replacement — idempotent
latest-wins MERGE — by actually writing a parquet table, applying an
update batch TWICE (the reference's retry scenario), and hash-matching
the final table state against the SQL definition of the merge.

``join_skew_split`` proves the manual skew-join split returns *exactly*
the plain join's rows — the oracle is the plain SQL join, so the whole
hot/cold/union machinery is checked for semantic transparency.

``stream_stream_join`` stages clicks/views landing dirs, runs a real
watermarked stream-stream interval join under Trigger.AvailableNow into
a memory sink (rows-only: multi-batch streaming execution isn't
ANSI-SQL-expressible, and join state expiry depends on watermark
progress across batches).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.scale import skew_split_join
from historic_score_etl_pipeline_spark.sinks.merge import merge_upsert
from historic_score_etl_pipeline_spark.sources.catalog import load_table
from historic_score_etl_pipeline_spark.streaming.jobs import (
    stream_stream_interval_join,
)


def _money(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# --- MERGE/upsert sink, exercised through a real table write ----------------


def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert all orders (v0), then upsert a +1000-price update batch
    (v1) for every 5th orderkey — TWICE, proving the reference's retry
    is a no-op under MERGE.  Returns the final table state aggregated
    per status; the oracle states the merge outcome declaratively."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", _money("o_totalprice").alias("price")
    )
    target = tempfile.mkdtemp(prefix="merge_target_") + "/orders_merged"
    base = o.withColumn("version", F.lit(0))
    merge_upsert(
        spark, target, base, ["o_orderkey"], "version", partition_col="o_orderstatus"
    )
    updates = (
        o.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("price", F.col("price") + F.lit(1000).cast("decimal(18,2)"))
        .withColumn("version", F.lit(1))
    )
    merge_upsert(
        spark, target, updates, ["o_orderkey"], "version", partition_col="o_orderstatus"
    )
    # the retry: same batch again — latest-wins makes it idempotent
    merge_upsert(
        spark, target, updates, ["o_orderkey"], "version", partition_col="o_orderstatus"
    )
    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).cast("double").alias("total_price"),
        )
    )


SINK_MERGE_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(round(sum(CASE WHEN o_orderkey % 5 = 0
                           THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1000
                           ELSE CAST(o_totalprice AS DECIMAL(18,2)) END), 2)
            AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderstatus
"""


# --- skew-split join: exactness proven against the plain join ---------------


def join_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders through the hot/cold split (threshold 5 rows per
    key at sf0.01 → both branches non-empty), aggregated per priority.
    The oracle is the PLAIN join — the split must be invisible."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _money("l_discount"))).alias("rev"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        skew_split_join(li, o, on="l_orderkey", hot_threshold=5)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
    )


JOIN_SKEW_SPLIT_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- stream-stream interval join (rows-only) ---------------------------------

_SSJ_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-view attribution as a REAL streaming job: stage the two
    event streams as file sources, join within a 2h per-user lookback
    under Trigger.AvailableNow, land in a PARQUET file sink and read
    that back.  The original memory sink collected the whole join
    result to the driver — fine on the clean fixtures, but the r9
    adversarial SKEW tile (one user owning ~50% of events) made the
    per-user lookback join legitimately data-sized (~14M rows at the
    sf0.1-sourced cell) and blew spark.driver.maxResultSize: exactly
    the driver-sized-sink anti-pattern a 100 TB job cannot carry.  A
    file sink keeps the result distributed end-to-end."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_stream_root,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
    )
    # ADVICE r9/r10: app-scoped + wiped-on-entry — one tree per query
    # per app (repeated invocations overwrite it), instead of one
    # mkdtemp tree + one atexit handler per invocation; stale trees of
    # dead apps are reaped inside the helper.
    root = app_scoped_stream_root(spark, "ssj", sf_dir)
    clicks_dir, views_dir = f"{root}/clicks", f"{root}/views"
    ev.where(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.where(F.col("event_type") == "view").write.parquet(views_dir)

    def _stream(d: str) -> DataFrame:
        return (
            spark.readStream.schema(_SSJ_SCHEMA)
            .parquet(d)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )

    joined = stream_stream_interval_join(_stream(clicks_dir), _stream(views_dir))
    out_dir = f"{root}/out_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{out_dir}_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # explicit schema: an empty result leaves no part files to infer from
    return spark.read.schema(joined.schema).parquet(out_dir)


QUERIES: dict[str, QuerySpec] = {
    "sink_merge_upsert": QuerySpec(sink_merge_upsert, SINK_MERGE_SQL),
    "join_skew_split": QuerySpec(join_skew_split, JOIN_SKEW_SPLIT_SQL),
    "stream_stream_join": QuerySpec(stream_stream_join, None),
}
