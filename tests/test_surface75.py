"""Batch-82 behavior: recall-eval recompute, DiD cell reconciliation,
KN continuation recompute, schedule slot recompute, winsorized clamp
law — independent twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface75
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _quantized_py(spark, sf_oracle):
    vecs = {}
    for r in load_table(spark, sf_oracle, "embeddings").collect():
        q = [int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]]
        b = (
            (1 if q[0] > 0 else 0) + (2 if q[1] > 0 else 0)
            + (4 if q[2] > 0 else 0) + (8 if q[3] > 0 else 0)
        )
        vecs[r["vec_id"]] = (q, b)
    return vecs


def test_recall_eval_recompute(spark, sf_oracle):
    vecs = _quantized_py(spark, sf_oracle)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    got = {
        r["vec_id"]: (r["n_overlap"], r["bucket"], r["recall_ppm"])
        for r in surface75.embed_octant_recall_eval(
            spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(range(10))
    for a in range(10):
        qa, ba = vecs[a]
        scored = sorted(
            ((-dot(qa, q), vid) for vid, (q, _) in vecs.items() if vid != a)
        )
        true10 = {vid for _, vid in scored[:10]}
        bucket_scored = sorted(
            (
                (-dot(qa, q), vid)
                for vid, (q, b) in vecs.items()
                if vid != a and b == ba
            )
        )
        approx10 = {vid for _, vid in bucket_scored[:10]}
        n_ov = len(true10 & approx10)
        assert got[a] == (n_ov, ba, n_ov * 1000000 // 10)


def test_did_cells_reconcile(spark, sf_oracle):
    e = Counter()
    ud = defaultdict(set)
    for r in load_table(spark, sf_oracle, "events").collect():
        t = 1 if r["user_id"] % 5 == 0 else 0
        p = 1 if r["ts"].day > 15 else 0
        e[(t, p)] += 1
        ud[(t, p)].add((r["user_id"], r["ts"].date()))
    row = surface75.event_did_estimator(spark, sf_oracle).collect()[0]
    assert (row["e_t1"], row["u_t1"]) == (e[(1, 0)], len(ud[(1, 0)]))
    assert (row["e_t2"], row["u_t2"]) == (e[(1, 1)], len(ud[(1, 1)]))
    assert (row["e_c1"], row["u_c1"]) == (e[(0, 0)], len(ud[(0, 0)]))
    assert (row["e_c2"], row["u_c2"]) == (e[(0, 1)], len(ud[(0, 1)]))
    # replay the cross-multiplied rational in Python bigints (the query
    # computes it in DECIMAL(38,0) — int64 overflows at sf0.1 cells)
    num = (
        (row["e_t2"] * row["u_t1"] - row["e_t1"] * row["u_t2"])
        * row["u_c1"] * row["u_c2"]
        - (row["e_c2"] * row["u_c1"] - row["e_c1"] * row["u_c2"])
        * row["u_t1"] * row["u_t2"]
    )
    den = row["u_t1"] * row["u_t2"] * row["u_c1"] * row["u_c2"]
    # div truncates toward zero in BOTH engines (verified) — replay that
    q = abs(num * 1_000_000) // den
    assert row["did_ppm"] == (q if num >= 0 else -q)
    # the rational equals the float DiD it fixpoints
    did = (
        row["e_t2"] / row["u_t2"] - row["e_t1"] / row["u_t1"]
        - (row["e_c2"] / row["u_c2"] - row["e_c1"] / row["u_c1"])
    )
    assert abs(num / den - did) < 1e-9


def test_kn_continuation_recompute(spark, sf_oracle):
    raw = Counter()
    lefts = defaultdict(set)
    for r in load_table(spark, sf_oracle, "documents").collect():
        ws = [w for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()) if w]
        for a, b in zip(ws, ws[1:]):
            raw[b] += 1
            lefts[b].add(a)
    scored = sorted(
        ((w, raw[w], len(lefts[w])) for w in raw),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    got = [
        (r["word"], r["raw_count"], r["continuation"])
        for r in surface75.text_kn_continuation_counts(
            spark, sf_oracle
        ).collect()
    ]
    assert got == scored


def test_schedule_slots_recompute(spark, sf_oracle):
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    hourly = Counter()
    days = set()
    for r in load_table(spark, sf_oracle, "events").collect():
        dn = (r["ts"].date() - epoch).days
        hourly[(dn, r["ts"].hour)] += 1
        days.add(dn)
    lo, hi = min(days), max(days)
    want = {}
    for sid, dows, hh in ((1, [0, 2, 4], 9), (2, [5, 6], 12),
                          (3, list(range(7)), 0)):
        slots = [dn for dn in range(lo, hi + 1) if dn % 7 in dows]
        want[sid] = (len(slots), sum(hourly.get((dn, hh), 0) for dn in slots))
    got = {
        r["sched_id"]: (r["n_slots"], r["n_events"])
        for r in surface75.date_schedule_expansion(spark, sf_oracle).collect()
    }
    assert got == want


def test_winsorized_clamp_law(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        per[r["l_returnflag"]].append(int(math.floor(r["l_quantity"] + 0.5)))
    got = {
        r["l_returnflag"]: (r["n"], r["lo_bound"], r["hi_bound"],
                            r["winsorized_sum"], r["winsorized_mean_ppm"])
        for r in surface75.agg_winsorized_mean(spark, sf_oracle).collect()
    }
    for flag, qs in per.items():
        qs.sort()
        n = len(qs)
        lo = qs[(n + 9) // 10 - 1]
        hi = qs[(9 * n + 9) // 10 - 1]
        ws = sum(max(min(q, hi), lo) for q in qs)
        assert got[flag] == (n, lo, hi, ws, ws * 1000000 // n)
        # clamping never exceeds the raw sum spread
        assert lo * n <= ws <= hi * n
