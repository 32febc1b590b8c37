"""Batch-92 behavior: apportionment conservation, nested-prune plan,
FILTER-clause recompute, projection-peak recompute, rule-score
recompute — independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface85
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_apportionment_conserves_budget(spark, sf_oracle):
    nat_of = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_oracle, "customer").collect()
    }
    w = Counter()
    for r in load_table(spark, sf_oracle, "orders").collect():
        w[nat_of[r["o_custkey"]]] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    t = sum(w.values())
    base = {
        n: (1_000_000 * x // t, (1_000_000 * x) % t) for n, x in w.items()
    }
    leftover = 1_000_000 - sum(f for f, _ in base.values())
    order = sorted(base, key=lambda n: (-base[n][1], n))
    want = {
        n: base[n][0] + (1 if order.index(n) < leftover else 0)
        for n in base
    }
    got = {
        r["nation"]: (r["w"], r["floor_share"], r["allocated"])
        for r in surface85.agg_budget_apportionment(
            spark, sf_oracle
        ).collect()
    }
    assert {n: v[2] for n, v in got.items()} == want
    assert {n: v[0] for n, v in got.items()} == dict(w)
    # exact conservation
    assert sum(v[2] for v in got.values()) == 1_000_000
    # apportionment never differs from the exact share by more than 1
    for n, (x, fs, alloc) in got.items():
        assert fs <= alloc <= fs + 1


def test_nested_prune_reads_leaf_only(spark, sf_oracle):
    from tests.test_scale_plans import explain_str

    df = surface85.scan_nested_struct_prune(spark, sf_oracle)
    plan = explain_str(df)
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "cents" in read
    assert "status" not in read and "priority" not in read, read
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderkey"] % 10]
        a[0] += 1
        a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        r["bucket"]: (r["n"], r["total_cents"]) for r in df.collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_filter_clause_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, set()])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        a = want[r["l_returnflag"]]
        a[0] += 1
        if r["l_quantity"] >= 25:
            a[1] += 1
        if r["l_discount"] == 0.0:
            a[2] += int(math.floor(r["l_extendedprice"] * 100 + 0.5))
        if r["l_tax"] > 0.04:
            a[3].add(r["l_suppkey"])
    got = {
        r["l_returnflag"]: (r["n"], r["n_bulk"], r["cents_undiscounted"],
                            r["suppliers_high_tax"])
        for r in surface85.sql_agg_filter_clause(spark, sf_oracle).collect()
    }
    assert got == {
        k: (a[0], a[1], a[2] if a[2] else None, len(a[3]))
        for k, a in want.items()
    }


def test_projection_peak_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8

        def gray(p):
            if nb == 0:
                return 0
            return (raw[(3 * p) % nb] + raw[(3 * p + 1) % nb]
                    + raw[(3 * p + 2) % nb]) // 3

        rows = [sum(gray(r_ * w + c) for c in range(w)) for r_ in range(h)]
        cols = [sum(gray(r_ * w + c) for r_ in range(h)) for c in range(w)]
        pr = rows.index(max(rows))
        pc = cols.index(max(cols))
        a = want[(r["source"], pr)]
        a[0] += 1
        a[1] += pc
    got = {
        (r["source"], r["peak_row"]): (r["n_images"], r["sum_peak_col"])
        for r in surface85.multimodal_image_projection_peak(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_rule_scores_recompute(spark, sf_oracle):
    per = defaultdict(lambda: {"p": [], "e": 0, "v": 0, "night": 0})
    for r in load_table(spark, sf_oracle, "events").collect():
        u = per[r["user_id"]]
        if r["event_type"] == "purchase":
            u["p"].append(int(r["ts"].timestamp() * 1_000_000))
        if r["event_type"] == "error":
            u["e"] += 1
        if r["event_type"] == "view":
            u["v"] += 1
        if r["ts"].hour < 5:
            u["night"] = 1
    want = Counter()
    for u in per.values():
        ts = sorted(u["p"])
        burst = 0
        for i, t in enumerate(ts):
            if sum(1 for s in ts[: i + 1]
                   if s >= t - 21600 * 1_000_000) >= 2:
                burst = 1
                break
        score = 3 * burst + 2 * (u["e"] > u["v"]) + u["night"]
        want[score] += 1
    got = {
        r["score"]: r["n_users"]
        for r in surface85.event_rule_score_matrix(spark, sf_oracle).collect()
    }
    assert got == dict(want)
