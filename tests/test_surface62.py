"""Batch-69 behavior: Bollinger recompute + band ordering, HLL
calibration vs truth, Easter known vectors, assortativity vs numpy,
idempotent append law — independent twins."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface62
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_bollinger_recompute(spark, sf_oracle):
    daily = defaultdict(int)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS d")
        .collect()
    ):
        daily[r["d"]] += 1
    days = sorted(daily)
    want = {}
    for i in range(19, len(days)):
        win = [daily[d] for d in days[i - 19 : i + 1]]
        s, q = sum(win), sum(x * x for x in win)
        sigma = math.sqrt((q * 20.0 - float(s) * float(s)) / 400.0)
        want[days[i].strftime("%Y-%m-%d")] = (
            daily[days[i]],
            s * 1000 // 20,
            int(math.floor(sigma * 1000.0 + 0.5)),
            int(math.floor(s / 20.0 * 1000.0 + 2.0 * sigma * 1000.0 + 0.5)),
            int(math.floor(s / 20.0 * 1000.0 - 2.0 * sigma * 1000.0 + 0.5)),
        )
    got = {
        r["day"]: (
            r["actual"], r["ma_milli"], r["sigma_milli"],
            r["upper_milli"], r["lower_milli"],
        )
        for r in surface62.window_bollinger_bands(spark, sf_oracle).collect()
    }
    assert got == want
    for _, ma, sg, up, lo in got.values():
        assert lo <= ma <= up and sg >= 0


def test_hll_calibration_error_is_bounded(spark, sf_oracle):
    rows = surface62.agg_hll_error_calibration(spark, sf_oracle).collect()
    users = defaultdict(set)
    for r in (
        load_table(spark, sf_oracle, "events")
        .select("event_type", "user_id")
        .collect()
    ):
        if r["user_id"] is not None:
            users[r["event_type"]].add(r["user_id"])
    for r in rows:
        assert r["true_users"] == len(users[r["event_type"]])
        assert (
            r["abs_err_ppm"]
            == abs(r["est_users"] - r["true_users"]) * 1000000 // r["true_users"]
        )
        # p=8 HLL/LC: ~6.5% typical — 25% is a generous sanity ceiling
        assert r["abs_err_ppm"] < 250_000


def test_easter_known_vectors(spark, sf_oracle):
    rows = {
        r["year"]: r["easter_sunday"]
        for r in surface62.date_easter_computus(spark, sf_oracle).collect()
    }
    # published Gregorian Easter dates
    known = {
        1995: "1995-04-16", 1996: "1996-04-07", 1997: "1997-03-30",
        1998: "1998-04-12", 1999: "1999-04-04", 2000: "2000-04-23",
        2001: "2001-04-15",
    }
    for y, d in rows.items():
        assert known[y] == d, (y, d)
        assert dt.date.fromisoformat(d).isoweekday() == 7  # Sunday
    # week counts match a recompute
    counts = defaultdict(int)
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"].date()
        e = dt.date.fromisoformat(known[d.year]) if d.year in known else None
        if e and e <= d < e + dt.timedelta(days=7):
            counts[d.year] += 1
    got_counts = {
        r["year"]: r["n_orders_easter_week"]
        for r in surface62.date_easter_computus(spark, sf_oracle).collect()
    }
    for y in rows:
        assert got_counts[y] == counts.get(y, 0)


def test_assortativity_matches_numpy(spark, sf_oracle):
    import numpy as np

    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    r_np = np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1]
    row = surface62.graph_degree_assortativity(spark, sf_oracle).collect()[0]
    assert row["n"] == 2 * len(edges)
    assert abs(row["assortativity_micro"] / 1e6 - r_np) < 1e-4


def test_idempotent_append_law(spark, sf_oracle):
    import math as m

    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        b = r["o_orderkey"] % 3
        want[b][0] += 1
        want[b][1] += int(m.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        r["batch_id"]: (r["n"], r["sum_cents"])
        for r in surface62.sink_append_idempotent_log(spark, sf_oracle).collect()
    }
    # the double-append must be invisible: counts equal ONE copy
    assert got == {k: tuple(v) for k, v in want.items()}
