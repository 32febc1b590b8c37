"""Batch-68 behavior: band join = naive O(n²) twin, burst sweep
recompute, pixel histogram replay, fixed-offset hour law, positional
stats recompute — independent twins."""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface61
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_band_join_matches_naive_quadratic(spark, sf_oracle):
    rows = [
        (r["o_orderkey"], r["o_orderstatus"],
         int(math.floor(r["o_totalprice"] * 100 + 0.5)))
        for r in load_table(spark, sf_oracle, "orders").collect()
    ]
    by_st = defaultdict(list)
    for k, st, c in rows:
        by_st[st].append((k, c))
    want = {}
    for st, items in by_st.items():
        n = s = 0
        mn = None
        for i, (k1, c1) in enumerate(items):
            for k2, c2 in items[i + 1 :]:
                d = abs(c1 - c2)
                if d <= 100:
                    n += 1
                    s += d
                    mn = d if mn is None else min(mn, d)
        want[st] = (n, s, mn)
    got = {
        r["st"]: (r["n_pairs"], r["sum_abs_diff"], r["min_diff"])
        for r in surface61.join_value_band_bucketed(spark, sf_oracle).collect()
    }
    assert got == want
    assert all(n > 0 for n, _, _ in want.values())


def test_burst_detection_matches_sweep(spark, sf_oracle):
    by_user = defaultdict(list)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND user_id IS NOT NULL")
        .select("user_id", "event_id", "ts")
        .collect()
    ):
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    want = {}
    minute = dt.timedelta(seconds=60)
    for u, evs in by_user.items():
        bounds = []
        for t, eid in evs:
            bounds.append((t, 1, eid))
            bounds.append((t + minute, -1, eid))
        bounds.sort(key=lambda x: (x[0], x[1], x[2]))
        cur = mx = 0
        for _, d, _2 in bounds:
            cur += d
            mx = max(mx, cur)
        want[u] = (len(evs), mx, mx >= 2)
    got = {
        r["user_id"]: (r["n_events"], r["max_burst_60s"], r["is_bursty"])
        for r in surface61.event_burst_detection(spark, sf_oracle).collect()
    }
    assert got == want
    flags = {v[2] for v in want.values()}
    assert flags == {True, False}  # some but not all users flag


def test_pixel_histogram_replays_bytes(spark, sf_oracle):
    want = defaultdict(int)
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = r["text"].encode()
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8
        for j in range(w * h):
            g = (
                raw[(3 * j) % nb] + raw[(3 * j + 1) % nb] + raw[(3 * j + 2) % nb]
            ) // 3 if nb else 0
            want[(r["source"], g // 16)] += 1
    got = {
        (r["source"], r["bin"]): r["n_px"]
        for r in surface61.multimodal_pixel_histogram(spark, sf_oracle).collect()
    }
    assert got == dict(want)


def test_fixed_offset_hours(spark, sf_oracle):
    want = defaultdict(int)
    shift = dt.timedelta(hours=5, minutes=30)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .select("event_type", "ts")
        .collect()
    ):
        want[(r["event_type"], (r["ts"] + shift).hour)] += 1
    got = {
        (r["event_type"], r["local_hour"]): r["n"]
        for r in surface61.date_fixed_offset_display(spark, sf_oracle).collect()
    }
    assert got == dict(want)
    # the half-hour offset must actually shift hour boundaries: the
    # local-hour histogram differs from the UTC one
    utc = defaultdict(int)
    for (ty, _h), n in got.items():
        utc[ty] += n
    assert sum(utc.values()) == sum(want.values())


def test_positional_stats_recompute(spark, sf_oracle):
    acc = defaultdict(lambda: [0, 0, set()])
    for r in load_table(spark, sf_oracle, "documents").collect():
        toks = [t for t in re.split(r"\s+", r["text"].strip()) if t][:10]
        for i, w in enumerate(toks):
            acc[i][0] += 1
            acc[i][1] += len(w)
            acc[i][2].add(w)
    got = {
        r["pos"]: (r["n_docs_with_pos"], r["avg_len_x100"], r["vocab"])
        for r in surface61.text_positional_token_stats(spark, sf_oracle).collect()
    }
    assert got == {
        i: (n, tot * 100 // n, len(vs)) for i, (n, tot, vs) in acc.items()
    }
    assert set(got) == set(range(10))
