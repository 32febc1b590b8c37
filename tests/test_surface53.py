"""Batch-60 behavior: HLL inclusion–exclusion vs exact truth + python
register replay, multichar-delim losslessness, EOM snapping, sweep-line
recompute, dynamic pivot discovery — independent twins."""

from __future__ import annotations

import calendar
import datetime as dt
import hashlib
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface53
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _py_hll_est(users) -> int:
    regs: dict[int, int] = {}
    for u in users:
        h = hashlib.md5(str(u).encode()).hexdigest()
        reg = int(h[:2], 16)
        suffix = int(h[2:17], 16)
        rho = 61 if suffix == 0 else 61 - len(bin(suffix)[2:])
        regs[reg] = max(regs.get(reg, 0), rho)
    m = 256
    s_total = sum(1 << (35 - min(r, 35)) for r in regs.values()) + (
        m - len(regs)
    ) * (1 << 35)
    raw = int(math.floor(47072.71267120224 * float(1 << 35) / s_total + 0.5))
    zeros = m - len(regs)
    if zeros > 0 and raw <= int(2.5 * m):
        return int(math.floor(256.0 * math.log(256.0 / zeros) + 0.5))
    return raw


def test_hll_intersection_matches_replay_and_truth(spark, sf_oracle):
    sets = defaultdict(set)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IN ('click', 'purchase')")
        .select("user_id", "event_type")
        .collect()
    ):
        sets[r["event_type"]].add(r["user_id"])
    a, b = sets["click"], sets["purchase"]
    ea, eb, eu = _py_hll_est(a), _py_hll_est(b), _py_hll_est(a | b)
    row = surface53.agg_hll_intersection(spark, sf_oracle).collect()[0]
    assert (
        row["est_click"], row["est_purchase"], row["est_union"],
        row["est_intersection"],
    ) == (ea, eb, eu, max(ea + eb - eu, 0))
    # estimator sanity: within 30% of the exact intersection
    truth = len(a & b)
    assert abs(row["est_intersection"] - truth) <= max(10, truth * 0.3)


def test_multichar_delim_roundtrip(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = (r["o_orderstatus"], r["o_orderpriority"])
        want[k][0] += 1
        want[k][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
        want[k][2] = (
            r["o_orderkey"]
            if want[k][2] is None
            else min(want[k][2], r["o_orderkey"])
        )
    got = {
        (r["status"], r["priority"]): (r["n"], r["sum_cents"], r["min_key"])
        for r in surface53.scan_csv_multichar_delim(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_month_end_snapping(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"].date()
        eom = d.replace(day=calendar.monthrange(d.year, d.month)[1])
        want[eom][0] += 1
        want[eom][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {}
    for r in surface53.date_month_end_rollup(spark, sf_oracle).collect():
        got[dt.date.fromisoformat(r["month_end"])] = (
            r["n_orders"], r["sum_cents"], r["next_month_end"]
        )
    for eom, (n, cents) in want.items():
        nm = (eom + dt.timedelta(days=1))
        nme = nm.replace(day=calendar.monthrange(nm.year, nm.month)[1])
        assert got[eom] == (n, cents, nme.strftime("%Y-%m-%d"))
    assert len(got) == len(want)


def test_sweep_line_matches_python(spark, sf_oracle):
    by_type = defaultdict(list)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .select("event_id", "event_type", "ts")
        .collect()
    ):
        by_type[r["event_type"]].append((r["ts"], r["event_id"]))
    want = {}
    for ty, evs in by_type.items():
        bounds = []
        for t, eid in evs:
            bounds.append((t, 1, eid))
            bounds.append((t + dt.timedelta(minutes=30), -1, eid))
        bounds.sort(key=lambda x: (x[0], x[1], x[2]))
        cur = mx = 0
        for _, d, _2 in bounds:
            cur += d
            mx = max(mx, cur)
        want[ty] = (len(evs), mx)
    got = {
        r["event_type"]: (r["n_intervals"], r["max_concurrent"])
        for r in surface53.event_concurrent_intervals_max(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(mx > 1 for _, mx in want.values())  # real overlap exists


def test_dynamic_pivot_discovers_types(spark, sf_oracle):
    df = surface53.sql_pivot_dynamic(spark, sf_oracle)
    # discovered columns are the sorted distinct types
    assert df.columns == [
        "dow_monday0", "click", "error", "purchase", "signup", "view",
    ]
    want = defaultdict(lambda: defaultdict(int))
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .select("ts", "event_type")
        .collect()
    ):
        want[r["ts"].date().weekday()][r["event_type"]] += 1
    got = {r["dow_monday0"]: r.asDict() for r in df.collect()}
    for dow, counts in want.items():
        for ty in ("click", "error", "purchase", "signup", "view"):
            assert got[dow][ty] == counts.get(ty, 0)
