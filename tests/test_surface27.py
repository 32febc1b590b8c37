"""Batch-34 behavior: max_by/min_by, percent change, multi-match regex
extraction — recompute twins + shuffle pins."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface27
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"\(\d+\) Exchange", buf.getvalue()))


def test_min_max_by_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_type", "value",
        F.unix_micros("ts").alias("us"), "event_id",
    ).collect()
    state: dict[tuple, list] = {}
    for r in rows:
        key = (r["user_id"], r["event_type"])
        cents = round(r["value"] * 100)
        ok = (r["us"], r["event_id"])
        a = state.setdefault(key, [None, None, None, None, 0])
        if a[0] is None or ok > a[0]:
            a[0], a[1] = ok, cents
        if a[2] is None or ok < a[2]:
            a[2], a[3] = ok, cents
        a[4] += 1
    expected = {k: (a[1], a[3], a[4]) for k, a in state.items()}
    df = surface27.agg_min_max_by(spark, sf_oracle)
    assert _exchanges(df) == 1
    got = {
        (r["user_id"], r["event_type"]):
            (r["latest_cents"], r["earliest_cents"], r["n"])
        for r in df.collect()
    }
    assert got == expected


def test_pct_change_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], round(r["value"] * 100))
        )
    expected = {}
    for lst in by_user.values():
        lst.sort()
        prev = None
        for _us, eid, c in lst:
            if prev is None or prev == 0:
                expected[eid] = None
            else:
                expected[eid] = round((c - prev) * 100.0 / prev, 6)
            prev = c
    got = {
        r["event_id"]: r["pct_change_r6"]
        for r in surface27.window_pct_change(spark, sf_oracle).collect()
    }
    assert set(got) == set(expected)
    for eid, want in expected.items():
        if want is None:
            assert got[eid] is None
        else:
            # Python round() is banker's; Spark/DuckDB round-6 is
            # HALF_UP (and they agree — parity is the exact gate).
            # Allow the twin one unit in the 6th decimal for .5 cases.
            assert abs(got[eid] - want) <= 1.01e-6
    # each user's first event must be NULL
    assert sum(1 for v in got.values() if v is None) >= len(by_user)


def test_regexp_extract_all_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select("event_type", "props").collect()
    expected: dict[str, list] = {}
    for r in rows:
        nums = [int(m) for m in re.findall(r"[0-9]+", r["props"])]
        a = expected.setdefault(r["event_type"], [0, set(), 0])
        a[0] += len(nums)
        a[1].update(nums)
        a[2] += sum(nums)
    df = surface27.str_regexp_extract_all(spark, sf_oracle)
    got = {
        r["event_type"]: (r["n_matches"], r["n_distinct"], r["total"])
        for r in df.collect()
    }
    assert got == {k: (a[0], len(a[1]), a[2]) for k, a in expected.items()}
    assert all(n > 0 for n, _d, _t in got.values())
