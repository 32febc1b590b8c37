"""Batch-79 behavior: residual/fence recompute, contract-rule recompute,
dwell recompute, skyline dominance law, CSV null-marker roundtrip —
independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface72
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_seasonal_residual_recompute(spark, sf_oracle):
    daily = Counter()
    for r in load_table(spark, sf_oracle, "events").collect():
        daily[(r["event_type"], r["ts"].date())] += 1
    prof = defaultdict(lambda: [0, 0])
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    for (t, d), n in daily.items():
        dw = (d - epoch).days % 7
        prof[(t, dw)][0] += n
        prof[(t, dw)][1] += 1
    resid = {
        (t, d): n * prof[(t, (d - epoch).days % 7)][1]
        - prof[(t, (d - epoch).days % 7)][0]
        for (t, d), n in daily.items()
    }
    fences = {}
    by_type = defaultdict(list)
    for (t, d), r in resid.items():
        by_type[t].append((r, d))
    for t, lst in by_type.items():
        lst.sort()
        cnt = len(lst)
        q1 = lst[(cnt + 3) // 4 - 1][0]
        q3 = lst[(3 * cnt + 3) // 4 - 1][0]
        fences[t] = (q1, q3)
    got = {
        (r["event_type"], r["day"]): (r["n"], r["r"], r["is_outlier"])
        for r in surface72.anomaly_seasonal_residual_iqr(
            spark, sf_oracle
        ).collect()
    }
    assert len(got) == len(daily)
    for (t, d), n in daily.items():
        r = resid[(t, d)]
        q1, q3 = fences[t]
        out = 2 * r < 2 * q1 - 3 * (q3 - q1) or 2 * r > 2 * q3 + 3 * (q3 - q1)
        assert got[(t, str(d))] == (n, r, out)


def test_contract_rules_recompute(spark, sf_oracle):
    got = {
        r["rule_id"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in surface72.audit_schema_contract_check(
            spark, sf_oracle
        ).collect()
    }
    orders = load_table(spark, sf_oracle, "orders").collect()
    n_bad_price = sum(1 for r in orders if r["o_totalprice"] <= 0)
    assert got["orders.totalprice_positive"] == (
        len(orders), n_bad_price, n_bad_price == 0,
    )
    ev = load_table(spark, sf_oracle, "events").collect()
    n_null = sum(1 for r in ev if r["value"] is None)
    assert got["events.value_not_null"] == (len(ev), n_null, n_null == 0)
    assert len(got) == 5
    for n_checked, n_viol, passed in got.values():
        assert passed == (n_viol == 0)
        assert 0 <= n_viol <= n_checked


def test_dwell_recompute(spark, sf_oracle):
    per_user = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        us = int(r["ts"].timestamp() * 1_000_000)
        per_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    sessions = []
    for rows in per_user.values():
        rows.sort()
        cur = []
        for row in rows:
            if cur and row[0] - cur[-1][0] > 2 * 3600 * 1_000_000:
                sessions.append(cur)
                cur = []
            cur.append(row)
        if cur:
            sessions.append(cur)
    by_type = defaultdict(list)
    for s in sessions:
        by_type[s[0][2]].append(s[-1][0] - s[0][0])
    got = {
        r["start_type"]: (r["n_sessions"], r["median_dwell_us"],
                          r["max_dwell_us"])
        for r in surface72.sessionize_dwell_time(spark, sf_oracle).collect()
    }
    for t, dwells in by_type.items():
        dwells.sort()
        med = dwells[(len(dwells) + 1) // 2 - 1]
        n, gm, gx = got[t]
        assert n == len(dwells) and gx == dwells[-1]
        # the rank-filtered median uses (user, session) tiebreaks; equal
        # dwell values make the VALUE identical regardless of tiebreak
        assert gm == med


def test_pareto_front_dominance_law(spark, sf_oracle):
    pts = defaultdict(set)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        pts[r["l_returnflag"]].add(
            (int(math.floor(r["l_extendedprice"] * 100 + 0.5)),
             int(math.floor(r["l_quantity"] + 0.5)))
        )
    want = {}
    for flag, ps in pts.items():
        front = {
            (p, q)
            for (p, q) in ps
            if not any(
                (p2 <= p and q2 >= q and (p2 < p or q2 > q))
                for (p2, q2) in ps
            )
        }
        want[flag] = front
    got = defaultdict(set)
    for r in surface72.agg_pareto_front_2d(spark, sf_oracle).collect():
        got[r["flag"]].add((r["price_c"], r["qty"]))
    assert dict(got) == want


def test_csv_null_literals_roundtrip(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        if r["o_orderkey"] % 7 == 0:
            a[1] += 1
        else:
            a[2] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        r["status"]: (r["n_rows"], r["n_null_price"], r["sum_price_cents"])
        for r in surface72.scan_csv_null_literals(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
