"""Batch-85 behavior: underwater run recompute, Jaccard identity,
greedy-walk recompute, scene-cut recompute, char-class conservation —
independent twins."""

from __future__ import annotations

import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface78
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_underwater_runs_recompute(spark, sf_oracle):
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
        mx = None
        best = run = total = 0
        for _, _, _, c in rows:
            mx = c if mx is None else max(mx, c)
            if c < mx:
                run += 1
                total += 1
                best = max(best, run)
            else:
                run = 0
        want[sk] = (len(rows), total, best)
    got = {
        r["l_suppkey"]: (r["n_rows"], r["n_underwater"],
                         r["longest_underwater"])
        for r in surface78.window_underwater_duration(
            spark, sf_oracle
        ).collect()
    }
    assert got == want


def test_weighted_jaccard_identity(spark, sf_oracle):
    cnt = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, sf_oracle, "events").collect():
        cnt[r["event_type"]][r["user_id"]] += 1
    got = {
        (r["type_a"], r["type_b"]): (r["n_both_users"], r["min_sum"],
                                     r["max_sum"],
                                     r["weighted_jaccard_ppm"])
        for r in surface78.event_type_user_jaccard(spark, sf_oracle).collect()
    }
    types = sorted(cnt)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for (a, b), (nb_users, mins, maxs, jac) in got.items():
        A, B = cnt[a], cnt[b]
        users = set(A) | set(B)
        wmin = sum(min(A.get(u, 0), B.get(u, 0)) for u in users)
        wmax = sum(max(A.get(u, 0), B.get(u, 0)) for u in users)
        assert (nb_users, mins, maxs) == (
            len(set(A) & set(B)), wmin, wmax,
        )
        assert jac == wmin * 1000000 // wmax
        # weighted Jaccard is bounded by the set Jaccard's support
        assert 0 <= jac <= 1000000


def test_greedy_walk_recompute(spark, sf_oracle):
    order_parts = defaultdict(set)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_partkey"] < 400:
            order_parts[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in order_parts.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    nxt = {u: min(vs) for u, vs in adj.items()}
    got = {
        r["start"]: (r["hop1"], r["hop2"], r["hop3"])
        for r in surface78.graph_greedy_walk_3steps(spark, sf_oracle).collect()
    }
    want = {
        u: (nxt[u], nxt[nxt[u]], nxt[nxt[nxt[u]]])
        for u in nxt
        if nxt[u] in nxt and nxt[nxt[u]] in nxt
    }
    assert got == want
    # after one hop to a MIN neighbor, the walk 2-cycles: hop3 == hop1
    for h1, h2, h3 in got.values():
        assert h3 in (h1, nxt.get(h2))


def test_scene_cuts_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        sums = [sum(raw[i : i + 32]) for i in range(0, len(raw), 32)]
        jumps = [abs(b - a) for a, b in zip(sums, sums[1:])]
        a = want[r["source"]]
        a[0] += 1
        a[1] += len(sums)
        a[2] += sum(1 for j in jumps if j > 160)
        a[3] = max(a[3], max(jumps) if jumps else 0)
    got = {
        r["source"]: (r["n_clips"], r["n_frames"], r["n_cuts"],
                      r["max_jump"])
        for r in surface78.multimodal_video_scene_cuts(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_char_classes_conserved(spark, sf_oracle):
    import re

    want = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        t = r["text"] or ""
        a = want[r["source"]]
        a[0] += len(t)
        a[1] += len(re.findall(r"[A-Za-z]", t))
        a[2] += len(re.findall(r"[0-9]", t))
        a[3] += len(re.findall(r"\s", t))
    for a in want.values():
        a[4] = a[0] - a[1] - a[2] - a[3]
    got = {
        r["source"]: (r["total"], r["letters"], r["digits"], r["spaces"],
                      r["other"])
        for r in surface78.str_char_class_histogram(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # conservation: classes partition the text
    for total, letters, digits, spaces, other in got.values():
        assert letters + digits + spaces + other == total
