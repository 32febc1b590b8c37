"""Batch-39 behavior: max drawdown vs sequential recompute, KMV
intersection algebra, engine-neutral weekday, URL canonicalization —
recompute twins."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface32
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _events(spark, sf):
    return load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros("ts").alias("us"),
    ).collect()


def test_drawdown_matches_sequential(spark, sf_oracle):
    rows = _events(spark, sf_oracle)
    by_user: dict[int, list] = {}
    for r in rows:
        cents = math.floor(r["value"] * 100 + 0.5)
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], cents)
        )
    want = {}
    for u, lst in by_user.items():
        lst.sort()
        cum = peak = 0
        maxdd = 0
        for _us, _eid, c in lst:
            cum += c
            peak = max(peak, cum)
            maxdd = max(maxdd, peak - cum)
        want[u] = (maxdd, len(lst))
    got = {
        r["user_id"]: (r["max_dd_cents"], r["n_events"])
        for r in surface32.window_drawdown_max(spark, sf_oracle).collect()
    }
    assert got == want


def _kmv_sets(rows):
    sets: dict[str, set] = {}
    for r in rows:
        h = int(
            hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:15], 16
        )
        sets.setdefault(r["event_type"], set()).add(h)
    return sets


def _kmv_est(s: set) -> float:
    if len(s) < surface32._KMV_K:
        return float(len(s))
    hk = sorted(s)[surface32._KMV_K - 1]
    return (surface32._KMV_K - 1) * surface32._KMV_SPACE / float(hk)


def test_kmv_intersection_matches_python_and_truth(spark, sf_oracle):
    rows = _events(spark, sf_oracle)
    sets = _kmv_sets(rows)
    truth: dict[str, set] = {}
    for r in rows:
        truth.setdefault(r["event_type"], set()).add(r["user_id"])
    got = {
        (r["type_a"], r["type_b"]): r["est_intersection"]
        for r in surface32.agg_kmv_intersection(spark, sf_oracle).collect()
    }
    types = sorted(sets)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            est = max(
                0.0,
                _kmv_est(sets[ta])
                + _kmv_est(sets[tb])
                - _kmv_est(sets[ta] | sets[tb]),
            )
            assert got[(ta, tb)] == math.floor(est + 0.5)
            # sketch error envelope vs the true intersection (union size
            # dominates the variance; allow a generous 3σ-ish bound)
            true = len(truth[ta] & truth[tb])
            bound = max(10, 0.5 * len(truth[ta] | truth[tb]) * 0.126 * 3)
            assert abs(got[(ta, tb)] - true) <= bound, (ta, tb, got[(ta, tb)], true)


def test_dow_profile_matches_python(spark, sf_oracle):
    import datetime as dt

    rows = load_table(spark, sf_oracle, "events").select(
        "event_type", "value", F.col("ts").cast("date").alias("d")
    ).collect()
    want: dict[tuple, list] = {}
    for r in rows:
        days = (r["d"] - dt.date(1970, 1, 1)).days
        dow = (days + 3) % 7
        # python weekday(): Monday=0 — the engine-neutral index must agree
        assert dow == r["d"].weekday()
        cents = math.floor(r["value"] * 100 + 0.5)
        a = want.setdefault((r["event_type"], dow), [0, 0])
        a[0] += 1
        a[1] += cents
    got = {
        (r["event_type"], r["dow_monday0"]): (r["n"], r["sum_cents"])
        for r in surface32.event_dow_profile(spark, sf_oracle).collect()
    }
    assert got == {k: (a[0], a[1]) for k, a in want.items()}


def test_url_canonicalize_rules(spark, sf_oracle):
    """Each canonicalization rule must be visible in the output: no
    query/fragment survives, no trailing slash, scheme+host lowercase,
    path case preserved, and messy variants COLLAPSE (some canonical
    has n_urls > 1)."""
    out = surface32.str_url_canonicalize(spark, sf_oracle).collect()
    assert any(r["n_urls"] > 1 for r in out)
    for r in out:
        c = r["canonical"]
        assert "?" not in c and "#" not in c
        assert not c.endswith("/")
        head, rest = c.split("/Docs/", 1)
        assert head == head.lower(), c  # scheme+host lowered
        assert "/Docs/" in c  # path case preserved
        assert rest.isdigit()
    # totals preserved
    docs = load_table(spark, sf_oracle, "documents").count()
    assert sum(r["n_urls"] for r in out) == docs
