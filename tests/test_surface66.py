"""Batch-73 behavior: tile partition laws, LCP recompute, link-
prediction brute force, halving-decay keep rates, 4-4-5 calendar laws
— independent twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface66
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_tile_means_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        w, h = nb % 24 + 8, nb % 16 + 8
        for j in range(w * h):
            row, col = j // w, j % w
            tr, tc = (row * 2) // h, (col * 2) // w
            g = (
                0
                if nb == 0
                else (raw[(3 * j) % nb] + raw[(3 * j + 1) % nb] + raw[(3 * j + 2) % nb]) // 3
            )
            k = (r["source"], tr, tc)
            want[k][0] += 1
            want[k][1] += g
    got = {
        (r["source"], r["tile_r"], r["tile_c"]):
            (r["n_px"], r["sum_gray"], r["mean_gray"])
        for r in surface66.multimodal_image_tile_means(spark, sf_oracle).collect()
    }
    assert got == {k: (n, s, s // n) for k, (n, s) in want.items()}
    # every source has exactly the 4 quadrants
    srcs = {k[0] for k in got}
    for s in srcs:
        assert {(k[1], k[2]) for k in got if k[0] == s} == {
            (0, 0), (0, 1), (1, 0), (1, 1)
        }


def _lcp(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_vocab_lcp_recompute(spark, sf_oracle):
    vocab = set()
    for r in load_table(spark, sf_oracle, "documents").collect():
        vocab.update(t for t in re.split(r"\s+", r["text"].strip().lower()) if t)
    groups = defaultdict(list)
    for t in sorted(vocab):
        groups[t[0]].append(t)
    want = {}
    for ch, toks in groups.items():
        lcps = [_lcp(a, b) for a, b in zip(toks, toks[1:])]
        n_pairs = len(lcps)
        s = sum(lcps)
        want[ch] = (
            len(toks), n_pairs, s, (s * 100) // n_pairs if n_pairs else None
        )
    got = {
        r["first_char"]: (r["n_types"], r["n_pairs"], r["sum_lcp"], r["avg_lcp_x100"])
        for r in surface66.text_vocab_lcp_compression(spark, sf_oracle).collect()
    }
    assert got == want


def test_link_prediction_bruteforce(spark, sf_oracle):
    li = [
        (r["l_orderkey"], r["l_partkey"])
        for r in load_table(spark, sf_oracle, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    by_order = defaultdict(set)
    for ok, pk in li:
        by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                adj[a].add(b)
                adj[b].add(a)
    seeds = sorted(adj, key=lambda u: (-len(adj[u]), u))[:3]
    got = defaultdict(list)
    for r in surface66.graph_link_predict_common_neighbors(spark, sf_oracle).collect():
        got[r["seed"]].append((r["rnk"], r["cand"], r["common_neighbors"]))
    assert set(got) == set(seeds)
    for s in seeds:
        scores = Counter()
        for mid in adj[s]:
            for cand in adj[mid]:
                if cand != s and cand not in adj[s]:
                    scores[cand] += 1
        want = sorted(
            ((c, cand) for cand, c in scores.items()), key=lambda t: (-t[0], t[1])
        )[:10]
        rows = sorted(got[s])
        assert [(c, cand) for _, cand, c in rows] == want
        assert [rk for rk, _, _ in rows] == list(range(1, len(want) + 1))


def test_recency_halflife_keep_rule(spark, sf_oracle):
    anchor = dt.date(2024, 2, 1)
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "events").collect():
        age = (anchor - r["ts"].date()).days
        k = age // 7
        draw = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:5], 16)
        kept = draw < (1048576 >> k)
        a = want[r["event_type"]]
        a[0] += 1
        if kept:
            a[1] += 1
            a[2] += int(math.floor(r["value"] * 100 + 0.5))
    got = {
        r["event_type"]: (r["n_total"], r["n_kept"], r["kept_cents"])
        for r in surface66.sample_recency_halflife(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # keep rate decays: older-than-4-halflives events keep < 10%
    for t, (n, kept, _) in got.items():
        assert 0 < kept < n


def test_calendar_445_laws(spark, sf_oracle):
    anchor = dt.date(1994, 12, 26)
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        wk = (d - anchor).days // 7
        fy, wiy = wk // 52, wk % 52
        q, wq = wiy // 13, wiy % 13
        period = q * 3 + (0 if wq < 4 else 1 if wq < 8 else 2) + 1
        want[(fy, period)][0] += 1
        want[(fy, period)][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        (r["fiscal_year"], r["period"]): (r["n_orders"], r["total_cents"])
        for r in surface66.date_calendar_445_rollup(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert all(1 <= p <= 12 for _, p in got)
