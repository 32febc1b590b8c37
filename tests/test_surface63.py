"""Batch-70 behavior: Holt recursion vs python loop, comment-CSV
equivalence, seasonal-strength recompute + bounds, zero-crossing
replay, D-N retention recompute — independent twins."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface63
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _daily(spark, sf_oracle):
    daily = defaultdict(int)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS d")
        .collect()
    ):
        daily[r["d"]] += 1
    return daily


def _div_tz(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_holt_matches_python_loop(spark, sf_oracle):
    daily = _daily(spark, sf_oracle)
    days = sorted(daily)
    want = {}
    l = daily[days[0]] * 1000
    b = 0
    want[1] = (days[0].strftime("%Y-%m-%d"), l, b)
    for i, d in enumerate(days[1:], start=2):
        l_new = _div_tz(l + b + daily[d] * 1000, 2)
        b = _div_tz(b + (l_new - l), 2)
        l = l_new
        want[i] = (d.strftime("%Y-%m-%d"), l, b)
    got = {
        r["i"]: (r["day"], r["l_milli"], r["b_milli"])
        for r in surface63.window_holt_smoothing_recursive(
            spark, sf_oracle
        ).collect()
    }
    assert got == want
    assert len(got) == len(days)


def test_comment_csv_equals_clean(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        want[r["o_orderstatus"]][0] += 1
        want[r["o_orderstatus"]][1] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    got = {
        r["status"]: (r["n"], r["sum_cents"])
        for r in surface63.scan_csv_comment_lines(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_seasonal_strength_recompute_and_bounds(spark, sf_oracle):
    daily = _daily(spark, sf_oracle)
    per_dow = defaultdict(lambda: [0, 0])
    t = q = nn = 0
    for d, n in daily.items():
        per_dow[d.weekday()][0] += n
        per_dow[d.weekday()][1] += 1
        t += n
        q += n * n
        nn += 1
    sb_raw = 0.0
    for dow in sorted(per_dow):
        tg, ng = per_dow[dow]
        sb_raw = sb_raw + float(tg) * float(tg) / float(ng)
    strength = (sb_raw - float(t) * float(t) / float(nn)) / (
        float(q) - float(t) * float(t) / float(nn)
    )
    row = surface63.event_seasonal_strength(spark, sf_oracle).collect()[0]
    assert row["n_days"] == nn
    assert row["seasonal_strength_ppm"] == int(
        math.floor(strength * 1000000.0 + 0.5)
    )
    assert 0 <= row["seasonal_strength_ppm"] <= 1_000_000


def test_zero_crossings_replay(spark, sf_oracle):
    got = {
        r["media_id"]: (r["n_samples"], r["zero_crossings"], r["peak"])
        for r in surface63.multimodal_audio_zero_crossings(
            spark, sf_oracle
        ).collect()
    }
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = r["text"].encode()
        nb = len(raw)
        n = nb % 441 + 100
        s = [((raw[j % nb] - 128) * 256) if nb else 0 for j in range(n)]
        signs = [1 if x >= 0 else -1 for x in s]
        zc = sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        assert got[r["doc_id"]] == (n, zc, max(abs(x) for x in s))


def test_retention_dn_recompute(spark, sf_oracle):
    active = defaultdict(set)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND ts IS NOT NULL")
        .selectExpr("user_id", "CAST(ts AS DATE) AS d")
        .collect()
    ):
        active[r["d"]].add(r["user_id"])
    import datetime as dt

    want = {}
    for d, users in active.items():
        n1 = len(users & active.get(d + dt.timedelta(days=1), set()))
        n7 = len(users & active.get(d + dt.timedelta(days=7), set()))
        want[d.strftime("%Y-%m-%d")] = (
            len(users), n1, n7,
            n1 * 1000000 // len(users), n7 * 1000000 // len(users),
        )
    got = {
        r["day"]: (r["n_active"], r["n_d1"], r["n_d7"], r["d1_ppm"], r["d7_ppm"])
        for r in surface63.event_retention_dn(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # real D1 retention
