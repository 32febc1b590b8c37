"""Batch-94 behavior: QUALIFY rewrite recompute, map-merge recompute,
split-point recompute, fertility recompute, medoid recompute —
independent twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface87
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_qualify_rewrite_recompute(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        per[r["o_orderstatus"]].append(
            (-int(math.floor(r["o_totalprice"] * 100 + 0.5)),
             r["o_orderkey"])
        )
    want = {}
    for st, lst in per.items():
        lst.sort()
        for rnk, (negc, k) in enumerate(lst[:2], start=1):
            want[(st, rnk)] = (k, -negc)
    got = {
        (r["o_orderstatus"], r["rnk"]): (r["o_orderkey"], r["cents"])
        for r in surface87.sql_qualify_dialect_pair(
            spark, sf_oracle
        ).collect()
    }
    assert got == want


def test_map_merge_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["user_id"] < 100:
            a = want[(r["user_id"], r["event_type"])]
            if r["ts"].day <= 15:
                a[0] += 1
            else:
                a[1] += 1
    got = {
        (r["user_id"], r["event_type"]): (r["h1"], r["h2"], r["total"])
        for r in surface87.hof_map_zip_with_merge(spark, sf_oracle).collect()
    }
    assert got == {k: (a[0], a[1], a[0] + a[1]) for k, a in want.items()}


def test_split_point_recompute(spark, sf_oracle):
    series = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_suppkey"] < 10:
            series[r["l_suppkey"]].append(
                (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
                 int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
            )
    want = {}
    for sk, rows in series.items():
        rows.sort()
        cs = [c for _, _, _, c in rows]
        n = len(cs)
        s_n = sum(cs)
        best = None
        s_i = 0
        for i in range(1, n):
            s_i += cs[i - 1]
            score = abs(s_i * (n - i) - (s_n - s_i) * i) * 1000000 // (
                i * (n - i)
            )
            if best is None or (-score, i) < best[0]:
                best = ((-score, i), (i, n, score))
        want[sk] = best[1]
    got = {
        r["l_suppkey"]: (r["split_at"], r["n_rows"], r["score_ppm"])
        for r in surface87.window_best_split_point(spark, sf_oracle).collect()
    }
    assert got == want


def test_fertility_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        t = r["text"] or ""
        words = [w for w in re.split(r"\s+", t) if w]
        pieces = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t.lower())
        a = want[r["source"]]
        a[0] += 1
        a[1] += len(words)
        a[2] += len(pieces)
    got = {
        r["source"]: (r["n_docs"], r["n_words"], r["n_pieces"],
                      r["fertility_ppm"])
        for r in surface87.text_tokenizer_fertility(
            spark, sf_oracle
        ).collect()
    }
    assert got == {
        k: (a[0], a[1], a[2], a[2] * 1000000 // a[1])
        for k, a in want.items()
    }
    # fertility >= 1: a word is at least one piece
    for _, _, _, f in got.values():
        assert f >= 1000000


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_medoid_recompute(spark, sf_oracle):
    wc = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if len(w) >= 3:
                wc[w] += 1
    blocks = defaultdict(list)
    for w, n in wc.items():
        blocks[w[:3]].append((w, n))
    want = {}
    for p, ws in blocks.items():
        best = None
        for w, _ in ws:
            cost = sum(_lev(w, y) * n for y, n in ws)
            if best is None or (cost, w) < best[:2]:
                best = (cost, w)
        want[p] = (best[1], best[0])
    got = {
        r["prefix"]: (r["medoid"], r["total_dist"])
        for r in surface87.str_group_medoid(spark, sf_oracle).collect()
    }
    assert got == want
