"""Batch-72 behavior: brute-force Kadane equivalence, RSI window
recompute, count-of-counts law, skip-gram brute pairs, VWAP running
ratio — independent twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface65
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _cents(v: float) -> int:
    return int(math.floor(v * 100 + 0.5))


def test_kadane_matches_bruteforce(spark, sf_oracle):
    seqs = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        s = _cents(r["value"])
        if r["event_type"] not in ("purchase", "signup"):
            s = -s
        seqs[r["user_id"]].append((r["ts"], r["event_id"], s))
    got = {
        r["user_id"]: (r["n_events"], r["max_prefix_cents"], r["max_run_cents"])
        for r in surface65.window_kadane_max_subarray(spark, sf_oracle).collect()
    }
    assert set(got) == set(seqs)
    for uid, rows in seqs.items():
        vals = [s for _, _, s in sorted(rows, key=lambda t: (t[0], t[1]))]
        # brute-force every nonempty contiguous run
        best = max(
            sum(vals[i:j])
            for i in range(len(vals))
            for j in range(i + 1, len(vals) + 1)
        )
        prefix, acc = [], 0
        for v in vals:
            acc += v
            prefix.append(acc)
        assert got[uid] == (len(vals), max(prefix), best)


def test_rsi_window_recompute(spark, sf_oracle):
    rows = [
        r
        for r in load_table(spark, sf_oracle, "lineitem").collect()
        if r["l_suppkey"] < 10
    ]
    series = defaultdict(list)
    for r in rows:
        series[r["l_suppkey"]].append(
            (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
             _cents(r["l_extendedprice"]))
        )
    want = {}
    for sk, items in series.items():
        items.sort()
        gains, losses = [], []
        prev = None
        for sd, ok, ln, c in items:
            d = 0 if prev is None else c - prev
            prev = c
            gains.append(max(d, 0))
            losses.append(max(-d, 0))
        for i, (sd, ok, ln, c) in enumerate(items):
            g14 = sum(gains[max(0, i - 13): i + 1])
            l14 = sum(losses[max(0, i - 13): i + 1])
            rsi = (g14 * 1000000) // (g14 + l14) if g14 + l14 > 0 else None
            want[(sk, ok, ln)] = (g14, l14, rsi)
    got = {
        (r["l_suppkey"], r["l_orderkey"], r["l_linenumber"]):
            (r["gain14"], r["loss14"], r["rsi_ppm"])
        for r in surface65.window_rsi_relative_strength(spark, sf_oracle).collect()
    }
    assert got == want


def test_freq_of_freq_laws(spark, sf_oracle):
    cnt = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        cnt.update(t for t in re.split(r"\s+", r["text"].strip().lower()) if t)
    kof = Counter(cnt.values())
    got = {
        r["occurrences"]: (r["n_types"], r["min_token"], r["max_token"])
        for r in surface65.agg_freq_of_freq(spark, sf_oracle).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(kof)
    # sum over the table reconstructs both type and token totals
    assert sum(n for n, _, _ in got.values()) == len(cnt)
    assert sum(k * got[k][0] for k in got) == sum(cnt.values())
    for k, (_, mn, mx) in got.items():
        ks = [t for t, c in cnt.items() if c == k]
        assert (min(ks), max(ks)) == (mn, mx)


def test_skipgram_bruteforce_topk(spark, sf_oracle):
    pairs = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        toks = [t for t in re.split(r"\s+", r["text"].strip().lower()) if t]
        for i, w1 in enumerate(toks):
            for d in (1, 2):
                if i + d < len(toks):
                    pairs[(w1, toks[i + d], d)] += 1
    want = sorted(
        ((c, w1, w2, d) for (w1, w2, d), c in pairs.items()),
        key=lambda t: (-t[0], t[1], t[2], t[3]),
    )[:25]
    got = [
        (r["cnt"], r["w1"], r["w2"], r["dist"])
        for r in surface65.text_skipgram_pairs(spark, sf_oracle).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1], t[2], t[3])) == want


def test_vwap_running_recompute(spark, sf_oracle):
    rows = [
        r
        for r in load_table(spark, sf_oracle, "lineitem").collect()
        if r["l_partkey"] < 20
    ]
    series = defaultdict(list)
    for r in rows:
        series[r["l_partkey"]].append(
            (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
             _cents(r["l_extendedprice"]), int(math.floor(r["l_quantity"] + 0.5)))
        )
    want = {}
    for pk, items in series.items():
        items.sort()
        pq = q = 0
        for sd, ok, ln, c, qty in items:
            pq += c * qty
            q += qty
            want[(pk, ok, ln)] = (pq, q, pq // q)
    got = {
        (r["l_partkey"], r["l_orderkey"], r["l_linenumber"]):
            (r["cum_pq_cents"], r["cum_qty"], r["vwap_cents"])
        for r in surface65.window_vwap_running(spark, sf_oracle).collect()
    }
    assert got == want
    # VWAP sits inside the running min/max price band
    for pk, items in series.items():
        mn = mx = None
        acc = []
        for sd, ok, ln, c, qty in sorted(items):
            mn = c if mn is None else min(mn, c)
            mx = c if mx is None else max(mx, c)
            assert mn <= got[(pk, ok, ln)][2] <= mx
