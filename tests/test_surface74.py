"""Batch-81 behavior: interpolation recompute + rational identity,
variable-fed band recompute, clustering-coefficient recompute, WAPE
recompute, symmetry recompute — independent twins."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface74
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_EPOCH = dt.date(1970, 1, 1)


def _daily_counts(spark, sf_oracle):
    daily = Counter()
    for r in load_table(spark, sf_oracle, "events").collect():
        daily[(r["event_type"], (r["ts"].date() - _EPOCH).days)] += 1
    return daily


def test_interpolation_recompute(spark, sf_oracle):
    daily = _daily_counts(spark, sf_oracle)
    by_type = defaultdict(dict)
    for (t, dn), n in daily.items():
        by_type[t][dn] = n
    got = {
        (r["event_type"], r["dn"]): (r["kind"], r["value_num"],
                                     r["value_den"], r["value_floor"])
        for r in surface74.window_gap_fill_interpolate(
            spark, sf_oracle
        ).collect()
    }
    for t, days in by_type.items():
        lo, hi = min(days), max(days)
        obs = {dn: n for dn, n in days.items() if dn % 3 != 0}
        for dn in range(lo, hi + 1):
            kind, num, den, fl = got[(t, dn)]
            if dn in obs:
                assert (kind, num, den, fl) == ("observed", obs[dn], 1, obs[dn])
            else:
                prevs = [d for d in obs if d < dn]
                nexts = [d for d in obs if d > dn]
                if prevs and nexts:
                    d1, d2 = max(prevs), min(nexts)
                    v1, v2 = obs[d1], obs[d2]
                    wn = v1 * (d2 - dn) + v2 * (dn - d1)
                    wd = d2 - d1
                    assert (kind, num, den, fl) == (
                        "interpolated", wn, wd, wn // wd,
                    )
                    # the rational is between its endpoints
                    assert min(v1, v2) * wd <= wn <= max(v1, v2) * wd
                else:
                    assert kind == "edge_hole"


def test_variables_band_recompute(spark, sf_oracle):
    import math

    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        band = "band_hi" if r["l_quantity"] >= 25.0 else "band_lo"
        a = want[(r["l_returnflag"], band)]
        a[0] += 1
        a[1] += int(math.floor(r["l_extendedprice"] * 100 + 0.5))
    got = {
        (r["l_returnflag"], r["band"]): (r["n"], r["cents"])
        for r in surface74.sql_declare_variables(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_clustering_coeff_recompute(spark, sf_oracle):
    order_parts = defaultdict(set)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_partkey"] < 400:
            order_parts[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in order_parts.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counted once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    rows = []
    for x, nbrs in adj.items():
        d = len(nbrs)
        co = (2 * tri[x] * 1000000) // (d * (d - 1)) if d >= 2 else 0
        rows.append((co, tri[x], x, d))
    rows.sort(key=lambda r: (-r[0], -r[1], r[2]))
    want = [(x, d, t, co) for co, t, x, d in rows[:20]]
    got = [
        (r["partkey"], r["deg"], r["tri"], r["coeff_ppm"])
        for r in surface74.graph_clustering_coeff_topk(
            spark, sf_oracle
        ).collect()
    ]
    assert got == want


def test_wape_recompute(spark, sf_oracle):
    daily = _daily_counts(spark, sf_oracle)
    by_type = defaultdict(dict)
    for (t, dn), n in daily.items():
        by_type[t][dn] = n
    got = {
        r["event_type"]: (r["n_days_scored"], r["abs_err"],
                          r["actual_total"], r["wape_ppm"])
        for r in surface74.event_wape_forecast_error(
            spark, sf_oracle
        ).collect()
    }
    for t, days in by_type.items():
        dns = sorted(days)
        scored = [
            (days[dn], days[dns[i - 7]])
            for i, dn in enumerate(dns)
            if i >= 7
        ]
        abs_err = sum(abs(a - f) for a, f in scored)
        total = sum(a for a, _ in scored)
        assert got[t] == (
            len(scored), abs_err, total, abs_err * 1000000 // total,
        )


def test_symmetry_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8

        def gray(p):
            if nb == 0:
                return 0
            return (raw[(3 * p) % nb] + raw[(3 * p + 1) % nb]
                    + raw[(3 * p + 2) % nb]) // 3

        half = w // 2
        s = sum(
            abs(gray(r_ * w + c) - gray(r_ * w + (w - 1 - c)))
            for r_ in range(h)
            for c in range(half)
        )
        a = want[r["source"]]
        a[0] += 1
        a[1] += s
        a[2] += h * half
    got = {
        r["source"]: (r["n_images"], r["asym_sum"], r["n_pairs"])
        for r in surface74.multimodal_image_symmetry_score(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
