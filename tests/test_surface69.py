"""Batch-76 behavior: SQL-UDF aggregate recompute, Hampel window
recompute, footer-stats skipping (and that the skip HAPPENED), leap-rule
recompute, two-round HITS recompute — independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface69
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def test_sql_udf_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        band = (
            "low" if r["l_quantity"] < 10
            else ("mid" if r["l_quantity"] < 30 else "high")
        )
        net = int(
            math.floor(
                r["l_extendedprice"] * (1.0 - r["l_discount"])
                * (1.0 + r["l_tax"]) * 100 + 0.5
            )
        )
        a = want[(r["l_returnflag"], band)]
        a[0] += 1
        a[1] += net
    got = {
        (r["l_returnflag"], r["band"]): (r["n"], r["net_total_cents"])
        for r in surface69.sql_scalar_udf_create(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the functions genuinely live in the catalog
    fns = {f.name for f in spark.catalog.listFunctions()}
    assert {"net_cents", "qty_band"} <= fns


def test_hampel_recompute(spark, sf_oracle):
    series = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_suppkey"] < 5:
            series[r["l_suppkey"]].append(
                (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
                 _cents(r["l_extendedprice"]))
            )
    want = {}
    for sk, rows in series.items():
        rows.sort()
        for i, (_, ok, ln, c) in enumerate(rows):
            win = sorted(v[3] for v in rows[max(0, i - 6): i + 1])
            med = win[(len(win) + 1) // 2 - 1]
            devs = sorted(abs(v - med) for v in win)
            mad = devs[(len(devs) + 1) // 2 - 1]
            want[(sk, ok, ln)] = (c, med, mad, abs(c - med) > 3 * mad)
    got = {
        (r["l_suppkey"], r["l_orderkey"], r["l_linenumber"]):
            (r["cents"], r["med7"], r["mad7"], r["is_outlier"])
        for r in surface69.window_hampel_filter(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(v[3] for v in got.values()) or len(got) < 50


def test_file_skipping_actually_skips(spark, sf_oracle):
    path = surface69._staged_range_clustered(spark, sf_oracle)
    kept, total, b_lo, b_hi = surface69._skip_files(path)
    assert total == 8
    assert 0 < len(kept) < total  # the skip genuinely happened
    assert b_lo < b_hi
    want = defaultdict(lambda: [0, 0, None, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        if b_lo <= k <= b_hi:
            a = want[r["o_orderstatus"]]
            a[0] += 1
            a[1] += _cents(r["o_totalprice"])
            a[2] = k if a[2] is None else min(a[2], k)
            a[3] = k if a[3] is None else max(a[3], k)
    got = {
        r["status"]: (r["n_orders"], r["total_cents"], r["min_key"],
                      r["max_key"])
        for r in surface69.scan_file_skipping_stats(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_leap_rule_recompute(spark, sf_oracle):
    import calendar

    want = defaultdict(lambda: [0, 0, set()])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        a = want[d.year]
        a[0] += 1
        a[1] += 1 if (d.month, d.day) == (2, 29) else 0
        a[2].add(d)
    got = {
        r["yy"]: (r["is_leap"], r["n_orders"], r["n_feb29_orders"],
                  r["n_active_days"])
        for r in surface69.date_leap_day_audit(spark, sf_oracle).collect()
    }
    assert got == {
        y: (calendar.isleap(y), a[0], a[1], len(a[2]))
        for y, a in want.items()
    }
    # non-leap years never see a Feb-29 order
    for is_leap, _, feb29, _ in got.values():
        assert is_leap or feb29 == 0


def test_hits_two_rounds_recompute(spark, sf_oracle):
    pairs = {
        (r["l_orderkey"], r["l_partkey"])
        for r in load_table(spark, sf_oracle, "lineitem").collect()
    }
    hub1 = Counter(o for o, _ in pairs)
    auth1, deg_p = Counter(), Counter()
    for o, p in pairs:
        auth1[p] += hub1[o]
        deg_p[p] += 1
    hub2 = Counter()
    for o, p in pairs:
        hub2[o] += auth1[p]
    auth2 = Counter()
    for o, p in pairs:
        auth2[p] += hub2[o]
    want = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["partkey"], r["auth2"], r["auth1"], r["deg_p"])
        for r in surface69.graph_hits_two_rounds(spark, sf_oracle).collect()
    ]
    assert [(p, a2) for p, a2, _, _ in got] == want
    for p, _, a1, dp in got:
        assert a1 == auth1[p] and dp == deg_p[p]
