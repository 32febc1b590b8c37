"""Batch-40 behavior: journey regex vs sequential recompute, RFM
quintile determinism, Gini identity, Kaplan-Meier vs a sequential
product, IPv4 parse/pack rules — recompute twins + a plan pin."""

from __future__ import annotations

import contextlib
import io
import math
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface33
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _events(spark, sf):
    return (
        load_table(spark, sf, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .collect()
    )


def test_pattern_regex_matches_sequential(spark, sf_oracle):
    rows = [r for r in _events(spark, sf_oracle) if r["event_type"]]
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["event_type"][0])
        )
    want = {}
    for u, lst in by_user.items():
        lst.sort()
        j = "".join(ch for _, _, ch in lst)
        want[u] = (
            len(j),
            1 if re.search("s.*v.*p", j) else 0,
            j.count("p"),
        )
    got = {
        r["user_id"]: (
            r["journey_len"],
            r["funnel_matched"],
            r["n_purchases"],
        )
        for r in surface33.event_pattern_regex(spark, sf_oracle).collect()
    }
    assert got == want


def test_rfm_quintiles_deterministic_and_balanced(spark, sf_oracle):
    out = surface33.event_rfm_scores(spark, sf_oracle).collect()
    n = len(out)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        counts: dict[int, int] = {}
        for r in out:
            assert 1 <= r[col] <= 5
            counts[r[col]] = counts.get(r[col], 0) + 1
        # ntile balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
    # quintile ORDER is the documented one: recency ascending means the
    # most recent customers get r_score 1
    freshest = min(out, key=lambda r: (r["recency_days"], r["o_custkey"]))
    assert freshest["r_score"] == 1
    top_spender = max(
        out, key=lambda r: (r["monetary_cents"], -r["o_custkey"])
    )
    assert top_spender["m_score"] == 1
    # rfm_code packs the three digits
    for r in out[:50]:
        assert r["rfm_code"] == r["r_score"] * 100 + r["f_score"] * 10 + r["m_score"]


def test_gini_matches_direct_formula(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_oracle, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    spend: dict[int, int] = {}
    for r in orders:
        spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + math.floor(
            r["o_totalprice"] * 100 + 0.5
        )
    by_nation: dict[int, list] = {}
    for ck, x in spend.items():
        by_nation.setdefault(cust[ck], []).append((x, ck))
    want = {}
    for nk, lst in by_nation.items():
        lst.sort()
        n = len(lst)
        s0 = sum(x for x, _ in lst)
        s1 = sum((i + 1) * x for i, (x, _) in enumerate(lst))
        g = (
            math.floor((2 * s1 - (n + 1) * s0) * 1e6 / (n * s0) + 0.5)
            if s0 > 0
            else None
        )
        want[nk] = (n, g)
    got = {
        r["c_nationkey"]: (r["n_cust"], r["gini_r6fp"])
        for r in surface33.agg_gini_concentration(spark, sf_oracle).collect()
    }
    assert got == want
    # Gini lives in [0, 1): every fixpointed value in range
    for _, g in got.values():
        if g is not None:
            assert 0 <= g < 1_000_000


def test_survival_km_matches_sequential_product(spark, sf_oracle):
    rows = _events(spark, sf_oracle)
    first: dict[int, str] = {}
    conv: dict[int, str] = {}
    horizon = max(r["day"] for r in rows)
    for r in rows:
        u = r["user_id"]
        if u not in first or r["day"] < first[u]:
            first[u] = r["day"]
        if r["event_type"] == "purchase" and (
            u not in conv or r["day"] < conv[u]
        ):
            conv[u] = r["day"]

    import datetime

    def days(a, b):
        da = datetime.date.fromisoformat(a)
        db = datetime.date.fromisoformat(b)
        return (db - da).days

    durations = []
    for u, d0 in first.items():
        if u in conv:
            durations.append((days(d0, conv[u]), 1))
        else:
            durations.append((days(d0, horizon), 0))
    life: dict[int, list] = {}
    for t, ev in durations:
        life.setdefault(t, [0, 0])[0 if ev else 1] += 1
    total = len(durations)
    want = {}
    seen = 0
    cum: int | None = 0
    for t in sorted(life):
        d, c = life[t]
        at_risk = total - seen
        seen += d + c
        if d > 0 and at_risk > d:
            cum = (cum or 0) + math.floor(
                (math.log(at_risk - d) - math.log(at_risk)) * 1e6 + 0.5
            )
        surv = cum if at_risk > d else None
        want[t] = (at_risk, d, c, surv)
    got = {
        r["t"]: (r["at_risk"], r["n_events"], r["n_censored"], r["surv_unats"])
        for r in surface33.event_survival_km(spark, sf_oracle).collect()
    }
    assert got == want
    # sanity: survival is monotone non-increasing (unats are <= 0, cum)
    unats = [
        v[3] for _, v in sorted(got.items()) if v[3] is not None
    ]
    assert all(b <= a for a, b in zip(unats, unats[1:]))


def test_ipv4_parse_and_packing_rules(spark, sf_oracle):
    out = surface33.str_ipv4_aggregate(spark, sf_oracle).collect()
    assert len(out) > 0
    for r in out:
        a, b, z1, z2 = r["subnet16"].split(".")
        assert (z1, z2) == ("0", "0")
        assert int(a) in (10, 172)  # the two synthesized /8 networks
        assert 0 <= int(b) <= 255
        # every member ip32 lies inside the /16
        lo = int(a) * 16777216 + int(b) * 65536
        assert lo <= r["min_ip32"] <= r["max_ip32"] < lo + 65536
        assert 1 <= r["n_hosts"] <= r["n_requests"]
    # totals add up to the event count
    n_events = load_table(spark, sf_oracle, "events").count()
    assert sum(r["n_requests"] for r in out) == n_events


def test_rfm_windows_run_on_dimension_not_fact(spark, sf_oracle):
    """The scale contract: ntile windows must sit ABOVE the customer
    aggregate (|customers| rows), never over the raw orders fact —
    i.e. the plan aggregates before any Window node."""
    df = surface33.event_rfm_scores(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    detail = plan.split("\n\n")[0]
    agg_first = min(
        i for i, ln in enumerate(detail.splitlines()) if "HashAggregate" in ln
    )
    win_first = min(
        i for i, ln in enumerate(detail.splitlines()) if "Window" in ln
    )
    # formatted plans print leaves LAST, so "aggregate before window"
    # means the HashAggregate node appears at a LARGER line index
    assert agg_first > win_first
