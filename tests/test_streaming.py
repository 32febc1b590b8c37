"""Structured Streaming gates (SURVEY.md §7-M5): the streaming twins
produce the same results as the batch contract queries, and checkpointed
AvailableNow runs are incremental."""

from __future__ import annotations

import tempfile
import uuid

from historic_score_etl_pipeline_spark.contract.windows import stream_tumbling_daily
from historic_score_etl_pipeline_spark.streaming import (
    daily_counts_stream,
    read_events_stream,
    run_available_now,
    sessionized_stream,
    watermarked_dedup_stream,
)

SF = "/root/testdata/sf0.001"


def _run(spark, stream, output_mode):
    name = f"q_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(stream, ckpt, name, output_mode)
    return spark.table(name)


def test_streaming_daily_counts_match_batch(spark):
    events = read_events_stream(spark, f"{SF}/events.parquet")
    got = _run(spark, daily_counts_stream(events), "complete").toPandas()
    expected = stream_tumbling_daily(spark, SF).toPandas()
    g = got.sort_values("day").reset_index(drop=True)
    e = expected.sort_values("day").reset_index(drop=True)
    assert list(g["day"]) == list(e["day"])
    assert list(g["n_events"]) == list(e["n_events"])
    assert list(g["sum_value"]) == list(e["sum_value"])


def test_streaming_dedup(spark):
    events = read_events_stream(spark, f"{SF}/events.parquet")
    got = _run(spark, watermarked_dedup_stream(events), "append")
    batch_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert got.count() == batch_n  # event_ids are unique → nothing dropped
    assert got.select("event_id").distinct().count() == batch_n


def test_streaming_session_window(spark):
    events = read_events_stream(spark, f"{SF}/events.parquet")
    got = _run(spark, sessionized_stream(events), "complete")
    assert got.count() > 0
    assert set(got.columns) == {"user_id", "sess_start", "sess_end", "n_events"}
