"""Batch-35 behavior: windowed funnel, retention cohorts, exact rolling
median, levenshtein blocking, centroid distances — recompute twins +
plan shape pins."""

from __future__ import annotations

import contextlib
import io
import math
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface28
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def _load_events(spark, sf):
    return load_table(spark, sf, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros("ts").alias("us"), "value",
    ).collect()


def test_funnel_matches_python(spark, sf_oracle):
    rows = _load_events(spark, sf_oracle)
    win_us = surface28._FUNNEL_WINDOW_DAYS * 86_400_000_000
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["us"], r["event_type"]))
    expected: dict[int, int] = {}
    for u, evs in by_user.items():
        t1 = min((us for us, t in evs if t == "view"), default=None)
        stage = 0
        if t1 is not None:
            stage = 1
            t2 = min(
                (us for us, t in evs
                 if t == "click" and t1 < us <= t1 + win_us),
                default=None,
            )
            if t2 is not None:
                stage = 2
                t3 = min(
                    (us for us, t in evs
                     if t == "purchase" and t2 < us <= t2 + win_us),
                    default=None,
                )
                if t3 is not None:
                    stage = 3
        expected[u] = stage
    want = {}
    for s in expected.values():
        want[s] = want.get(s, 0) + 1
    got = {
        r["stage"]: r["n_users"]
        for r in surface28.event_funnel_conversion(spark, sf_oracle).collect()
    }
    assert got == want
    assert len(got) >= 2  # the 3-day window must actually discriminate


def test_retention_cohort_matches_python(spark, sf_oracle):
    rows = _load_events(spark, sf_oracle)

    def monday(us: int) -> int:
        day = us // 86_400_000_000
        # 1970-01-01 was a Thursday → Monday grid offset 4
        return day - ((day + 3) % 7)

    first: dict[int, int] = {}
    for r in rows:
        u = r["user_id"]
        if u not in first or r["us"] < first[u]:
            first[u] = r["us"]
    cells: dict[tuple, set] = {}
    import datetime as dt

    for r in rows:
        w0, w = monday(first[r["user_id"]]), monday(r["us"])
        key = (
            str(dt.date(1970, 1, 1) + dt.timedelta(days=w0)),
            (w - w0) // 7,
        )
        cells.setdefault(key, set()).add(r["user_id"])
    want = {k: len(v) for k, v in cells.items()}
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in surface28.event_retention_cohort(spark, sf_oracle).collect()
    }
    assert got == want
    assert max(off for _w, off in got) >= 1  # multi-week activity exists


def test_rolling_median_matches_python(spark, sf_oracle):
    rows = _load_events(spark, sf_oracle)
    by_user: dict[int, list] = {}
    for r in rows:
        cents = math.floor(r["value"] * 100 + 0.5)
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], cents)
        )
    expected = {}
    for lst in by_user.values():
        lst.sort()
        for i, (_us, eid, _c) in enumerate(lst):
            frame = sorted(
                c for _u, _e, c in lst[max(0, i - surface28._MED_FRAME): i + 1]
            )
            expected[eid] = (frame[(len(frame) + 1) // 2 - 1], len(frame))
    df = surface28.window_rolling_median(spark, sf_oracle)
    plan = _plan(df)
    assert _exchanges(plan) == 1  # one hash partition, window runs in place
    got = {
        r["event_id"]: (r["med_cents"], r["n_win"]) for r in df.collect()
    }
    assert got == expected


def test_levenshtein_block_matches_python(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "lang", "text"
    ).collect()

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    pfx = {
        r["doc_id"]: (r["lang"], r["text"][: surface28._LEV_PREFIX])
        for r in docs
    }
    want = {}
    for ia, (la, pa) in pfx.items():
        if ia % surface28._LEV_THIN != 0:
            continue
        for ib, (lb, pb) in pfx.items():
            if ib == ia or lb != la:
                continue
            d = lev(pa, pb)
            if d <= surface28._LEV_MAX:
                want[(ia, ib)] = d
    df = surface28.str_levenshtein_block(spark, sf_oracle)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # thinned left side broadcast
    got = {
        (r["id_a"], r["id_b"]): r["lev_dist"] for r in df.collect()
    }
    assert got == want
    assert len(got) > 10


def test_centroid_dist_matches_numpy(spark, sf_oracle):
    import numpy as np

    emb = load_table(spark, sf_oracle, "embeddings").collect()
    micro = {
        r["vec_id"]: (
            r["label"],
            np.floor(
                np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5
            ).astype(np.int64),
        )
        for r in emb
    }
    by_label: dict[int, list] = {}
    for _vid, (lab, v) in micro.items():
        by_label.setdefault(lab, []).append(v)
    cent = {
        lab: np.floor_divide(np.sum(vs, axis=0), len(vs))
        for lab, vs in by_label.items()
    }
    want = {
        vid: (lab, int(((v - cent[lab]) ** 2).sum()))
        for vid, (lab, v) in micro.items()
    }
    got = {
        r["vec_id"]: (r["label"], r["d2_micro2"])
        for r in surface28.embed_centroid_dist(spark, sf_oracle).collect()
    }
    assert got == want
