"""Batch-32 behavior: compaction, hazard-CSV round-trip, week rollup,
first-wins dedup, and the REAL dropDuplicatesWithinWatermark bounded-
state semantics."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface25
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_compaction_reduces_files_and_loses_nothing(spark, sf_oracle):
    src = surface25._staged_fragmented_orders(spark, sf_oracle)
    n_src = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_src == surface25._FRAGMENT_FILES

    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    dst = app_scoped_dir(spark, "compact", sf_oracle)
    surface25.compact_dir(spark, src, dst)
    n_dst = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert n_dst <= surface25._COMPACT_TARGET

    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert after.exceptAll(before).count() == 0
    assert before.exceptAll(after).count() == 0


def test_quoted_multiline_csv_roundtrip_exact(spark, sf_oracle):
    """Row-level: every note must come back byte-identical — commas,
    quotes, and the embedded newline included."""
    orig = (
        load_table(spark, sf_oracle, "orders")
        .select("o_orderkey", surface25._gnarly_note().alias("note"))
    )
    path = surface25._staged_quoted_csv(spark, sf_oracle)
    back = (
        spark.read.schema("o_orderkey long, note string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )
    want = {r["o_orderkey"]: r["note"] for r in orig.collect()}
    got = {r["o_orderkey"]: r["note"] for r in back.collect()}
    assert got == want
    sample = next(iter(want.values()))
    assert "," in sample and '"' in sample and "\n" in sample


def test_week_rollup_matches_python(spark, sf_oracle):
    import datetime as dt

    orders = load_table(spark, sf_oracle, "orders")
    rows = orders.select("o_orderdate", "o_totalprice").collect()
    expected: dict[str, tuple[int, int]] = {}
    for r in rows:
        d = r["o_orderdate"]
        day = d.date() if isinstance(d, dt.datetime) else d
        monday = day - dt.timedelta(days=day.weekday())
        n, cents = expected.get(str(monday), (0, 0))
        expected[str(monday)] = (n + 1, cents + round(r["o_totalprice"] * 100))
    got = {
        r["week_start"]: (r["n_orders"], round(r["revenue"] * 100))
        for r in surface25.agg_week_rollup(spark, sf_oracle).collect()
    }
    assert got == expected
    # every key is a Monday
    for k in got:
        assert dt.date.fromisoformat(k).weekday() == 0


def test_firstwins_is_earliest_and_group_limited(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("us"), "event_id",
    ).collect()
    best: dict[tuple, tuple] = {}
    for r in rows:
        key = (r["user_id"], r["event_type"], round(r["value"] * 100))
        cand = (r["us"], r["event_id"])
        if key not in best or cand < best[key]:
            best[key] = cand
    df = surface25.stream_dedup_firstwins(spark, sf_oracle)
    got = {
        (r["user_id"], r["event_type"], r["cents"]):
            (r["first_ts_us"], r["first_event_id"])
        for r in df.collect()
    }
    assert got == best

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_dropduplicates_within_watermark_bounded_state(spark, tmp_path):
    """The semantic that distinguishes dropDuplicatesWithinWatermark
    from plain watermark+dropDuplicates: once the watermark passes a
    key's first sighting, its state is EVICTED — a later duplicate
    re-emits (at-least-once per window) instead of being suppressed by
    state that would otherwise grow with key cardinality forever."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from historic_score_etl_pipeline_spark.streaming import (
        dedup_within_watermark_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()

    def ts(hhmm: str):
        import datetime as dt

        h, m = int(hhmm[:2]), int(hhmm[2:])
        return dt.datetime(2024, 1, 1, h, m)

    # batch 1: key A twice (intra-batch dup) + key B
    pq.write_table(
        pa.table({"k": ["A", "A", "B"], "ts": [ts("1000"), ts("1001"), ts("1005")]}),
        landing / "b1.parquet",
    )
    time.sleep(1.1)
    # batch 2: far-future event that will advance the watermark STRICTLY
    # past A's expiry (first_ts + delay = 11:00; watermark becomes 12:00
    # AFTER this batch — watermarks propagate with a one-batch delay)
    pq.write_table(
        pa.table({"k": ["C"], "ts": [ts("1300")]}), landing / "b2.parquet"
    )
    time.sleep(1.1)
    # batch 3: runs WITH watermark 12:00 — A's state is evicted here
    pq.write_table(
        pa.table({"k": ["D"], "ts": [ts("1305")]}), landing / "b3.parquet"
    )
    time.sleep(1.1)
    # batch 4: duplicate A AFTER eviction → must RE-EMIT
    pq.write_table(
        pa.table({"k": ["A"], "ts": [ts("1330")]}), landing / "b4.parquet"
    )

    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    out = dedup_within_watermark_stream(stream, ["k"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["k"], r["ts"].strftime("%H%M"))
        for r in spark.sql("SELECT * FROM ddww").collect()
    )
    # A emitted twice (once per watermark window), intra-batch dup
    # suppressed, B/C/D once each
    assert rows == [
        ("A", "1000"), ("A", "1330"), ("B", "1005"),
        ("C", "1300"), ("D", "1305"),
    ], rows
