"""Tests for the MERGE sink, skew-split join, and stream-stream join
(batch 11): exactness, idempotence, partition-scoped rewrite, and
streaming-vs-batch equivalence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.scale import skew_split_join
from historic_score_etl_pipeline_spark.sinks.merge import merge_upsert
from historic_score_etl_pipeline_spark.sources.catalog import load_table
from historic_score_etl_pipeline_spark.streaming.jobs import (
    stream_stream_interval_join,
)

SF = "/root/testdata/sf0.001"


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# --- merge_upsert ------------------------------------------------------------


def test_merge_insert_update_and_new_keys(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0)],
        "k int, part string, v int, version int",
    )
    merge_upsert(spark, target, base, ["k"], "version", partition_col="part")
    updates = spark.createDataFrame(
        [(2, "a", 99, 1), (4, "b", 40, 1)],  # update k=2, insert k=4
        "k int, part string, v int, version int",
    )
    merge_upsert(spark, target, updates, ["k"], "version", partition_col="part")
    got = _rows(spark.read.parquet(target), "k", "v")
    assert got == [(1, 10), (2, 99), (3, 30), (4, 40)]


def test_merge_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 10, 0), (2, 20, 0)], "k int, v int, version int")
    merge_upsert(spark, target, base, ["k"], "version")
    updates = spark.createDataFrame([(2, 99, 1)], "k int, v int, version int")
    merge_upsert(spark, target, updates, ["k"], "version")
    once = _rows(spark.read.parquet(target), "k", "v")
    merge_upsert(spark, target, updates, ["k"], "version")  # the retry
    twice = _rows(spark.read.parquet(target), "k", "v")
    assert once == twice == [(1, 10), (2, 99)]


def test_merge_update_wins_without_version(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "old")], "k int, v string")
    merge_upsert(spark, target, base, ["k"])
    merge_upsert(spark, target, spark.createDataFrame([(1, "new")], "k int, v string"), ["k"])
    assert _rows(spark.read.parquet(target), "k", "v") == [(1, "new")]


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite must leave untouched partitions'
    files byte-identical — at 100 TB that IS the merge optimization."""
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10, 0), (2, "b", 20, 0)], "k int, part string, v int, version int"
    )
    merge_upsert(spark, target, base, ["k"], "version", partition_col="part")

    def part_files(p):
        d = os.path.join(target, f"part={p}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b_before = part_files("b")
    updates = spark.createDataFrame(
        [(1, "a", 11, 1)], "k int, part string, v int, version int"
    )
    merge_upsert(spark, target, updates, ["k"], "version", partition_col="part")
    assert part_files("b") == b_before  # partition b untouched
    got = _rows(spark.read.parquet(target), "k", "v")
    assert got == [(1, 11), (2, 20)]


# --- skew_split_join ----------------------------------------------------------


def test_skew_split_join_equals_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey")
    split = skew_split_join(li, o, on="l_orderkey", hot_threshold=4)
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    assert _rows(split, *cols) == _rows(plain, *cols)


def test_skew_split_join_exercises_both_branches(spark):
    # threshold 4 at sf0.001: orders have 1..7 lines → both hot and cold
    li = load_table(spark, SF, "lineitem")
    hot_n = (
        li.groupBy("l_orderkey").count().where(F.col("count") > 4).count()
    )
    cold_n = li.groupBy("l_orderkey").count().where(F.col("count") <= 4).count()
    assert hot_n > 0 and cold_n > 0


# --- stream-stream interval join ----------------------------------------------


def test_stream_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
    )
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    ev.where(F.col("event_type") == "click").write.parquet(clicks_dir)
    ev.where(F.col("event_type") == "view").write.parquet(views_dir)

    schema = "event_id long, ts_us long, user_id long, event_type string"

    def _stream(d):
        return (
            spark.readStream.schema(schema)
            .parquet(d)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )

    joined = stream_stream_interval_join(_stream(clicks_dir), _stream(views_dir))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = _rows(spark.table("ssj_test"), "click_id", "view_id")

    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.timestamp_micros("ts_us").alias("click_ts"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.timestamp_micros("ts_us").alias("view_ts"),
    )
    batch = c.join(
        v,
        F.expr(
            "c_user = v_user AND view_ts >= click_ts - INTERVAL 2 HOURS"
            " AND view_ts <= click_ts"
        ),
    )
    assert streamed == _rows(batch, "click_id", "view_id")
    assert len(streamed) > 0
