"""Batch-44 behavior: DAU/WAU vs set recompute, bounce vs session
sizes, new/returning vs first-seen dict, heatmap vs datetime module,
streaks vs consecutive-day scan — recompute twins."""

from __future__ import annotations

import datetime as dt

from historic_score_etl_pipeline_spark.contract import surface37
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _user_days(spark, sf):
    rows = (
        load_table(spark, sf, "events")
        .where("ts IS NOT NULL AND user_id IS NOT NULL")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day", "ts")
        .collect()
    )
    return rows


def test_dau_wau_matches_set_recompute(spark, sf_oracle):
    rows = _user_days(spark, sf_oracle)
    du = {(r["day"], r["user_id"]) for r in rows}
    days = sorted({d for d, _ in du})
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness_ppm"])
        for r in surface37.event_stickiness_dau_wau(spark, sf_oracle).collect()
    }
    assert len(got) == len(days)
    for day in days:
        dau = len({u for d, u in du if d == day})
        wau = len({u for d, u in du if 0 <= (day - d).days <= 6})
        want = (dau, wau, dau * 1_000_000 // wau)
        assert got[day.strftime("%Y-%m-%d")] == want, day


def test_bounce_rate_matches_session_sizes(spark, sf_oracle):
    rows = _user_days(spark, sf_oracle)
    sess: dict[tuple, int] = {}
    for r in rows:
        sess[(r["day"], r["user_id"])] = sess.get((r["day"], r["user_id"]), 0) + 1
    per_day: dict[dt.date, list[int]] = {}
    for (d, _u), n in sess.items():
        per_day.setdefault(d, []).append(n)
    got = {
        r["day"]: (r["n_sessions"], r["n_bounce"], r["bounce_ppm"])
        for r in surface37.event_bounce_rate(spark, sf_oracle).collect()
    }
    for d, ns in per_day.items():
        nb = sum(1 for n in ns if n == 1)
        assert got[d.strftime("%Y-%m-%d")] == (
            len(ns),
            nb,
            nb * 1_000_000 // len(ns),
        )


def test_new_vs_returning_consistency(spark, sf_oracle):
    rows = _user_days(spark, sf_oracle)
    du = {(r["day"], r["user_id"]) for r in rows}
    first: dict[int, dt.date] = {}
    for d, u in du:
        if u not in first or d < first[u]:
            first[u] = d
    out = sorted(
        surface37.event_new_vs_returning(spark, sf_oracle).collect(),
        key=lambda r: r["day"],
    )
    cum = 0
    for r in out:
        day = dt.date.fromisoformat(r["day"])
        dau = len({u for d, u in du if d == day})
        new = sum(1 for u, d0 in first.items() if d0 == day)
        cum += new
        assert (r["dau"], r["new_users"], r["returning"], r["cum_users"]) == (
            dau,
            new,
            dau - new,
            cum,
        ), r["day"]
    # the final cumulative base equals the distinct user count
    assert cum == len(first)


def test_hour_heatmap_matches_datetime(spark, sf_oracle):
    rows = _user_days(spark, sf_oracle)
    cnt: dict[tuple, int] = {}
    for r in rows:
        ts = r["ts"]
        cell = (ts.date().weekday(), ts.hour)  # python: Monday=0
        cnt[cell] = cnt.get(cell, 0) + 1
    total = sum(cnt.values())
    got = {
        (r["dow_monday0"], r["hr"]): (r["n"], r["share_ppm"])
        for r in surface37.event_hour_heatmap(spark, sf_oracle).collect()
    }
    assert got == {
        cell: (n, n * 1_000_000 // total) for cell, n in cnt.items()
    }


def test_streaks_match_consecutive_scan(spark, sf_oracle):
    rows = _user_days(spark, sf_oracle)
    by_user: dict[int, set] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], set()).add(r["day"])
    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak"], r["n_streaks"])
        for r in surface37.event_streak_longest(spark, sf_oracle).collect()
    }
    assert set(got) == set(by_user)
    for u, days in by_user.items():
        ordered = sorted(days)
        runs, cur = [], 1
        for a, b in zip(ordered, ordered[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[u] == (len(days), max(runs), len(runs)), u
