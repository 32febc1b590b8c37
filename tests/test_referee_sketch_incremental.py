"""Batch 12 tests: referee-pipeline output-shape parity with the
reference's ref_historic_match DDL, HLL sketch identities, and exactness
of incremental state maintenance."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.incremental import (
    merge_state,
    partial_aggregate,
)
from historic_score_etl_pipeline_spark.operators.sketches import (
    build_sketches,
    rollup_estimate,
)
from historic_score_etl_pipeline_spark.plans.referee import DETAIL_KEYS, referee_pipeline
from historic_score_etl_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


# --- referee pipeline ---------------------------------------------------------


def test_referee_output_shape_matches_reference_ddl(spark):
    """Column names/order mirror ref_historic_match (app/ref_utilities.py:26-37);
    every column is a string (the reference's VARCHAR/JSONB)."""
    df = referee_pipeline(spark, SF)
    assert df.columns == [
        "date",
        "time",
        "hometeam",
        "awayteam",
        "result",
        "matchlink",
        "league",
        "refereelink",
        "referee_matchistlink",
        "referee_matchhistdetails",
    ]
    assert all(dt == "string" for _, dt in df.dtypes)
    assert df.count() > 0


def test_referee_detail_json_is_parallel_arrays_with_reference_keys(spark):
    rows = (
        referee_pipeline(spark, SF)
        .where(F.col("referee_matchhistdetails") != "{}")
        .limit(5)
        .collect()
    )
    assert rows, "no fixture got a detail table"
    for r in rows:
        doc = json.loads(r.referee_matchhistdetails)
        # the reference's exact 7 keys, including its 'Unkown Card' typo
        assert list(doc.keys()) == DETAIL_KEYS
        lengths = {len(v) for v in doc.values()}
        assert len(lengths) == 1 and lengths.pop() > 0  # parallel arrays
        links = json.loads(r.referee_matchistlink)
        assert list(links.keys()) == ["1"] and len(links["1"]) == 1  # limit-1


def test_referee_hop_joins_are_broadcast(spark):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        referee_pipeline(spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2, plan


# --- HLL sketches --------------------------------------------------------------


def test_sketch_union_equals_direct_sketch_and_is_accurate(spark):
    ev = load_table(spark, SF, "events").withColumn("day", F.col("ts").cast("date"))
    daily = build_sketches(ev, ["day", "event_type"], "user_id")
    rolled = rollup_estimate(daily, ["event_type"])

    direct = build_sketches(ev, ["event_type"], "user_id")
    direct_est = rollup_estimate(direct, ["event_type"])

    merged = {r.event_type: r.approx_distinct for r in rolled.collect()}
    straight = {r.event_type: r.approx_distinct for r in direct_est.collect()}
    # lossless union: merging per-day sketches == sketching the raw data
    assert merged == straight

    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for t, est in merged.items():
        assert abs(est - exact[t]) / exact[t] < 0.05, (t, est, exact[t])


def test_sketch_global_rollup(spark):
    ev = load_table(spark, SF, "events").withColumn("day", F.col("ts").cast("date"))
    daily = build_sketches(ev, ["day"], "user_id")
    got = rollup_estimate(daily, []).collect()[0]
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(got.approx_distinct - exact) / exact < 0.05
    assert got.n_rows == ev.count()


# --- incremental matview --------------------------------------------------------


def test_incremental_fold_is_exact(spark):
    ev = load_table(spark, SF, "events").select(
        F.col("ts").cast("date").alias("day"),
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    keys = ["event_type"]
    measures = {
        "n": ("count", "event_id"),
        "s": ("sum", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    split = F.lit("2024-01-10").cast("date")
    state = partial_aggregate(ev.where(F.col("day") < split), keys, measures)
    delta = partial_aggregate(ev.where(F.col("day") >= split), keys, measures)
    updated = merge_state(state, delta, keys, measures)
    full = partial_aggregate(ev, keys, measures)
    got = sorted(tuple(r) for r in updated.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


def test_incremental_new_keys_appear(spark):
    state = partial_aggregate(
        spark.createDataFrame([("a", 1)], "k string, v int"),
        ["k"],
        {"n": ("count", "v"), "s": ("sum", "v")},
    )
    delta = partial_aggregate(
        spark.createDataFrame([("b", 5), ("a", 2)], "k string, v int"),
        ["k"],
        {"n": ("count", "v"), "s": ("sum", "v")},
    )
    got = {
        r.k: (r.n, r.s)
        for r in merge_state(
            state, delta, ["k"], {"n": ("count", "v"), "s": ("sum", "v")}
        ).collect()
    }
    assert got == {"a": (2, 3), "b": (1, 5)}
