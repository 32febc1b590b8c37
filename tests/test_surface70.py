"""Batch-77 behavior: edge-energy recompute vs independently decoded
pixels, k-core peeling recompute, Markov matrix-square recompute,
Simpson sign identity, Lorenz curve properties — independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface70
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_edge_energy_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8
        gray = [
            (
                (raw[(3 * p) % nb] + raw[(3 * p + 1) % nb]
                 + raw[(3 * p + 2) % nb]) // 3
                if nb else 0
            )
            for p in range(w * h)
        ]
        he = sum(
            abs(gray[p + 1] - gray[p])
            for p in range(w * h) if p % w < w - 1
        )
        ve = sum(
            abs(gray[p + w] - gray[p])
            for p in range(w * (h - 1))
        )
        a = want[r["source"]]
        a[0] += 1
        a[1] += he
        a[2] += ve
    got = {
        r["source"]: (r["n_images"], r["h_energy"], r["v_energy"],
                      r["total_energy"])
        for r in surface70.multimodal_image_edge_energy(
            spark, sf_oracle
        ).collect()
    }
    assert got == {
        k: (n, he, ve, he + ve) for k, (n, he, ve) in want.items()
    }


def test_kcore_peel_recompute(spark, sf_oracle):
    pairs = {
        (r["l_orderkey"] * 2, r["l_partkey"] * 2 + 1)
        for r in load_table(spark, sf_oracle, "lineitem").collect()
    }
    und = pairs | {(v, u) for u, v in pairs}

    def peel(edges):
        deg = Counter(u for u, _ in edges)
        keep = {u for u, d in deg.items() if d >= 6}
        return {(u, v) for u, v in edges if u in keep and v in keep}

    e1 = peel(und)
    e2 = peel(e1)
    want = {
        0: (len({u for u, _ in und}), len(und) // 2),
        1: (len({u for u, _ in e1}), len(e1) // 2),
        2: (len({u for u, _ in e2}), len(e2) // 2),
    }
    got = {
        r["pass"]: (r["n_nodes"], r["n_edges"])
        for r in surface70.graph_kcore_two_pass(spark, sf_oracle).collect()
    }
    assert got == want
    # peeling is monotone
    assert got[0][0] >= got[1][0] >= got[2][0]
    assert got[0][1] >= got[1][1] >= got[2][1]


def test_markov_two_step_recompute(spark, sf_oracle):
    seqs = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    n1 = Counter()
    for rows in seqs.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            n1[(a, b)] += 1
    want = Counter()
    for (a, b), n in n1.items():
        for (b2, c), m in n1.items():
            if b2 == b:
                want[(a, c)] += n * m
    got = {
        (r["src"], r["dst"]): r["paths2"]
        for r in surface70.event_markov_two_step(spark, sf_oracle).collect()
    }
    assert got == dict(want)


def test_simpson_sign_identity(spark, sf_oracle):
    rows = surface70.agg_simpson_rate_audit(spark, sf_oracle).collect()
    by_yy = {r["yy"]: r for r in rows}
    # pooled row equals the sum of the per-year rows
    years = [r for r in rows if r["yy"] != 0]
    pooled = by_yy[0]
    for f in ("a_lo", "n_lo", "a_hi", "n_hi"):
        assert pooled[f] == sum(r[f] for r in years)
    # the sign matches the float comparison it replaces
    for r in rows:
        if r["n_lo"] and r["n_hi"]:
            lo, hi = r["a_lo"] / r["n_lo"], r["a_hi"] / r["n_hi"]
            want = 1 if lo > hi else (-1 if lo < hi else 0)
            assert r["lo_minus_hi_sign"] == want


def test_lorenz_curve_properties(spark, sf_oracle):
    spend = defaultdict(int)
    for r in load_table(spark, sf_oracle, "orders").collect():
        spend[r["o_custkey"]] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    nat_of = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_oracle, "customer").collect()
    }
    per_nat_total = Counter()
    per_nat_n = Counter()
    for ck, cents in spend.items():
        per_nat_total[nat_of[ck]] += cents
        per_nat_n[nat_of[ck]] += 1
    rows = surface70.agg_lorenz_deciles(spark, sf_oracle).collect()
    by_nat = defaultdict(list)
    for r in rows:
        by_nat[r["nat"]].append(r)
    assert set(by_nat) == set(per_nat_total)
    for nat, rs in by_nat.items():
        rs.sort(key=lambda r: r["decile"])
        # totals reconcile and the curve is convex-ish: monotone cum
        assert sum(r["n_customers"] for r in rs) == per_nat_n[nat]
        assert rs[-1]["cum_cents"] == per_nat_total[nat]
        assert rs[-1]["cum_share_ppm"] == 1000000
        cums = [r["cum_cents"] for r in rs]
        assert cums == sorted(cums)
        # deciles ordered ascending by spend => decile_cents nondecreasing
        # in aggregate per-customer mean
        means = [r["decile_cents"] / r["n_customers"] for r in rs]
        assert means == sorted(means)
