"""Batch-88 behavior: streaming top-k vs batch twin, prefix-scan
equivalence, equalization recompute, crossing recompute, rollup
distinct recompute — independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface81
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_stream_topk_equals_batch(spark, sf_oracle):
    counts = Counter()
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["ts"] is not None and r["event_type"] is not None:
            us = int(r["ts"].timestamp() * 1_000_000)
            win = (us // 21_600_000_000) * 21_600_000_000
            counts[(win, r["event_type"])] += 1
    by_win = defaultdict(list)
    for (win, t), n in counts.items():
        by_win[win].append((-n, t))
    want = {}
    for win, lst in by_win.items():
        lst.sort()
        for rnk, (negn, t) in enumerate(lst[:3], start=1):
            want[(win, rnk)] = (t, -negn)
    got = {
        (r["win_start_us"], r["rnk"]): (r["event_type"], r["n"])
        for r in surface81.stream_tumbling_topk(spark, sf_oracle).collect()
    }
    assert got == want


def test_prefix_scan_equals_window(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_orderkey"] < 2000:
            per[r["l_orderkey"]].append(
                (r["l_linenumber"],
                 int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
            )
    want = {}
    for k, rows in per.items():
        rows.sort()
        run = 0
        for i, (_, c) in enumerate(rows, start=1):
            run += c
            want[(k, i)] = run
    got = {
        (r["k"], r["line_idx"]): r["prefix_cents"]
        for r in surface81.hof_array_prefix_scan(spark, sf_oracle).collect()
    }
    assert got == want
    # final prefix equals the order total
    totals = defaultdict(int)
    for (k, _), c in got.items():
        totals[k] = max(totals[k], c)
    for k, rows in per.items():
        assert totals[k] == sum(c for _, c in rows)


def test_hist_equalization_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8
        grays = [
            ((raw[(3 * p) % nb] + raw[(3 * p + 1) % nb]
              + raw[(3 * p + 2) % nb]) // 3 if nb else 0)
            for p in range(w * h)
        ]
        hist = Counter(g // 16 for g in grays)
        cum = {}
        run = 0
        for b in range(16):
            run += hist.get(b, 0)
            cum[b] = run
        npx = w * h
        s = sum((cum[g // 16] * 255) // npx for g in grays)
        a = want[r["source"]]
        a[0] += 1
        a[1] += npx
        a[2] += s
    got = {
        r["source"]: (r["n_images"], r["n_px"], r["sum_eq"])
        for r in surface81.multimodal_image_hist_equalization(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_threshold_crossing_recompute(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        per[r["o_custkey"]].append(
            (d, r["o_orderkey"],
             int(math.floor(r["o_totalprice"] * 100 + 0.5)))
        )
    want = Counter()
    for rows in per.values():
        rows.sort()
        cum = 0
        for d, _, c in rows:
            cum += c
            if cum >= 50_000_000:
                want[f"{d.year:04d}-{d.month:02d}"] += 1
                break
    got = {
        r["ym"]: r["n_customers"]
        for r in surface81.event_spend_threshold_crossing(
            spark, sf_oracle
        ).collect()
    }
    assert got == dict(want)


def test_rollup_distinct_recompute(spark, sf_oracle):
    rows = load_table(spark, sf_oracle, "orders").collect()
    got = {
        (r["o_orderstatus"], r["o_orderpriority"], r["gid"]):
            (r["n_customers"], r["n_orders"])
        for r in surface81.agg_rollup_count_distinct(
            spark, sf_oracle
        ).collect()
    }
    # leaf level
    leaf = defaultdict(set)
    leaf_n = Counter()
    for r in rows:
        leaf[(r["o_orderstatus"], r["o_orderpriority"])].add(r["o_custkey"])
        leaf_n[(r["o_orderstatus"], r["o_orderpriority"])] += 1
    for (s, p), custs in leaf.items():
        assert got[(s, p, 0)] == (len(custs), leaf_n[(s, p)])
    # status level (priority nulled, gid 1)
    st = defaultdict(set)
    st_n = Counter()
    for r in rows:
        st[r["o_orderstatus"]].add(r["o_custkey"])
        st_n[r["o_orderstatus"]] += 1
    for s, custs in st.items():
        assert got[(s, None, 1)] == (len(custs), st_n[s])
    # grand total (gid 3)
    assert got[(None, None, 3)] == (
        len({r["o_custkey"] for r in rows}), len(rows),
    )
