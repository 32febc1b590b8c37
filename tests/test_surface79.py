"""Batch-86 behavior: split assignment recompute, anagram signature
recompute, multiline reassembly recompute, velocity rule recompute,
star-EXCEPT pruning — independent twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface79
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_two_centroid_split_recompute(spark, sf_oracle):
    vecs = {}
    for r in load_table(spark, sf_oracle, "embeddings").collect():
        vecs[r["vec_id"]] = [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
    c0, c1 = vecs[0], vecs[1]
    want = {0: [0, 0], 1: [0, 0]}
    for q in vecs.values():
        d0 = sum((x - y) ** 2 for x, y in zip(q, c0))
        d1 = sum((x - y) ** 2 for x, y in zip(q, c1))
        side = 0 if d0 <= d1 else 1
        want[side][0] += 1
        want[side][1] += min(d0, d1)
    got = {
        r["side"]: (r["n"], r["inertia"])
        for r in surface79.embed_two_centroid_split(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the seed vectors assign to their own side at distance 0 influence
    assert got[0][0] + got[1][0] == len(vecs)


def test_anagram_signatures_recompute(spark, sf_oracle):
    wc = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if len(w) >= 3:
                wc[w] += 1
    classes = defaultdict(lambda: [set(), 0])
    for w, n in wc.items():
        sig = "".join(sorted(w))
        classes[sig][0].add(w)
        classes[sig][1] += n
    scored = sorted(
        ((sig, len(ws), occ, min(ws)) for sig, (ws, occ) in classes.items()),
        key=lambda t: (-t[1], -t[2], t[0]),
    )[:20]
    got = [
        (r["signature"], r["n_words"], r["n_occurrences"], r["example_word"])
        for r in surface79.text_anagram_classes(spark, sf_oracle).collect()
    ]
    assert got == scored


def test_multiline_reassembly_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        a = want[r["o_orderstatus"]]
        a[0] += 1
        a[1] += k % 3
        a[2] += sum(cents + j for j in range(1, k % 3 + 1))
    got = {
        r["status"]: (r["n_records"], r["n_continuations"], r["payload_sum"])
        for r in surface79.scan_multiline_log_records(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_velocity_rule_recompute(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["event_type"] == "purchase":
            per[r["user_id"]].append(int(r["ts"].timestamp() * 1_000_000))
    want = {}
    for u, ts in per.items():
        ts.sort()
        peak = 1
        for i, t in enumerate(ts):
            cnt = sum(1 for s in ts[: i + 1] if s >= t - 21600 * 1_000_000)
            peak = max(peak, cnt)
        if peak >= 2:
            want[u] = (len(ts), peak)
    got = {
        r["user_id"]: (r["n_purchases"], r["peak_burst"])
        for r in surface79.event_fraud_velocity_rule(
            spark, sf_oracle
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # the rule genuinely fires at sf0.01


def test_star_except_prunes_and_rolls_up(spark, sf_oracle):
    df = surface79.sql_star_except_exclude(spark, sf_oracle)
    want = defaultdict(lambda: [0, None, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        a[1] = r["o_orderkey"] if a[1] is None else min(a[1], r["o_orderkey"])
        a[2] = r["o_custkey"] if a[2] is None else max(a[2], r["o_custkey"])
    got = {
        r["o_orderstatus"]: (r["n"], r["min_key"], r["max_cust"])
        for r in df.collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
