"""Batch-90 behavior: view-chain plan collapse, day-gap recompute,
role-playing matrix recompute, proration conservation, time-travel
snapshot law — independent twins."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface83
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_view_chain_collapses_to_one_scan(spark, sf_oracle):
    from tests.test_scale_plans import explain_str

    df = surface83.sql_view_chain_inlining(spark, sf_oracle)
    plan = explain_str(df)
    # one aggregation exchange, filters merged into ONE scan stage
    # (formatted mode prints each node twice: tree + details)
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("Scan parquet") == 2, plan
    assert "Union" not in plan, plan
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_quantity"] >= 10 and r["l_discount"] <= 0.05:
            a = want[r["l_returnflag"]]
            a[0] += 1
            a[1] += int(
                math.floor(
                    r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100
                    + 0.5
                )
            )
    got = {
        r["l_returnflag"]: (r["n"], r["net_total"]) for r in df.collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_day_gaps_recompute(spark, sf_oracle):
    per = defaultdict(set)
    for r in load_table(spark, sf_oracle, "events").collect():
        per[r["user_id"]].add(r["ts"].date())
    n_gaps = Counter()
    users = defaultdict(set)
    for u, days in per.items():
        ds = sorted(days)
        for a, b in zip(ds, ds[1:]):
            g = (b - a).days
            n_gaps[g] += 1
            users[g].add(u)
    got = {
        r["gap_days"]: (r["n_gaps"], r["n_users"])
        for r in surface83.event_active_day_gap_histogram(
            spark, sf_oracle
        ).collect()
    }
    assert got == {g: (n, len(users[g])) for g, n in n_gaps.items()}


def test_role_playing_matrix_recompute(spark, sf_oracle):
    odate = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_table(spark, sf_oracle, "orders").collect()
    }
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        od = odate[r["l_orderkey"]]
        od = od.date() if hasattr(od, "date") else od
        sd = r["l_shipdate"]
        sd = sd.date() if hasattr(sd, "date") else sd
        oq = f"{od.year}-Q{(od.month - 1) // 3 + 1}"
        sq = f"{sd.year}-Q{(sd.month - 1) // 3 + 1}"
        a = want[(oq, sq)]
        a[0] += 1
        a[1] += int(math.floor(r["l_extendedprice"] * 100 + 0.5))
    got = {
        (r["order_q"], r["ship_q"]): (r["n_lines"], r["cents"])
        for r in surface83.join_role_playing_date_dim(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_proration_conserves_cents(spark, sf_oracle):
    rows = surface83.date_proration_split(spark, sf_oracle).collect()
    total_prorated = sum(r["prorated_cents"] for r in rows)
    total_cents = 0
    want = defaultdict(int)
    for r in load_table(spark, sf_oracle, "orders").collect():
        start = r["o_orderdate"]
        start = start.date() if hasattr(start, "date") else start
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        total_cents += cents
        # replay the share arithmetic
        shares = []
        for mo in range(3):
            y = start.year + (start.month - 1 + mo) // 12
            m = (start.month - 1 + mo) % 12 + 1
            m_start = dt.date(y, m, 1)
            ny, nm = (y + (m == 12), m % 12 + 1)
            m_end_cal = dt.date(ny, nm, 1)
            lo = max(start, m_start)
            hi = min(start + dt.timedelta(days=45), m_end_cal)
            days = (hi - lo).days
            if days > 0:
                shares.append([m_start, cents * days // 45])
        rem = cents - sum(s for _, s in shares)
        shares[0][1] += rem
        for m_start, s in shares:
            want[f"{m_start.year:04d}-{m_start.month:02d}"] += s
    # conservation: prorated total equals the raw total exactly
    assert total_prorated == total_cents
    got = {r["ym"]: r["prorated_cents"] for r in rows}
    assert got == dict(want)


def test_time_travel_snapshot_law(spark, sf_oracle):
    from historic_score_etl_pipeline_spark.contract.surface73 import (
        _staged_txn_table,
    )

    table_dir = _staged_txn_table(spark, sf_oracle)
    v1 = surface83._live_files_as_of(table_dir, 1)
    assert {p.rsplit("/", 1)[-1] for p in v1} == {"file_a", "file_b"}
    v0 = surface83._live_files_as_of(table_dir, 0)
    assert {p.rsplit("/", 1)[-1] for p in v0} == {"file_a"}
    want = defaultdict(lambda: [0, 0, None, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        if k % 3 in (0, 1):
            a = want[r["o_orderstatus"]]
            a[0] += 1
            a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
            a[2] = k if a[2] is None else min(a[2], k)
            a[3] = k if a[3] is None else max(a[3], k)
    got = {
        r["status"]: (r["n_orders"], r["total_cents"], r["min_key"],
                      r["max_key"])
        for r in surface83.scan_txn_log_time_travel(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
