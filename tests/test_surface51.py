"""Batch-58 behavior: SRP-LSH recall law vs brute force, bipartite
Jaccard recompute, moving-average backtest recompute, Chao1 formula,
bounded-funnel monotonicity — independent python twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface51
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _py_srp_sig(vec) -> int:
    q = [int(math.floor(float(x) * 1e6 + 0.5)) for x in vec]
    sig = 0
    for b in range(16):
        s = 0
        for i, x in enumerate(q):
            h = int(hashlib.md5(f"hp_{b}_{i}".encode()).hexdigest()[0], 16)
            s += x if h % 2 == 1 else -x
        if s > 0:
            sig |= 1 << b
    return sig


def test_srp_matches_bruteforce_with_band_recall(spark, sf_oracle):
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    sigs = {k: _py_srp_sig(v) for k, v in vecs.items()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d > 3:
                continue
            # pigeonhole: hamming ≤ 3 over 4 bands ⟹ ≥ 1 identical band
            assert any(
                (sigs[a] >> (4 * k)) & 15 == (sigs[b] >> (4 * k)) & 15
                for k in range(4)
            ), (a, b)
            want[(a, b)] = d
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in surface51.embed_lsh_hyperplane(spark, sf_oracle).collect()
    }
    assert got == want
    assert got  # fixture produces real near-pairs


def test_bipartite_jaccard_matches_sets(spark, sf_oracle):
    users: dict[str, set] = defaultdict(set)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    ):
        users[r["event_type"]].add(r["user_id"])
    types = sorted(users)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            inter = len(users[a] & users[b])
            union = len(users[a] | users[b])
            want[(a, b)] = (inter, union, inter * 1000000 // union)
    got = {
        (r["type_a"], r["type_b"]): (r["n_inter"], r["n_union"], r["jaccard_ppm"])
        for r in surface51.graph_bipartite_jaccard(spark, sf_oracle).collect()
    }
    assert got == want


def test_moving_avg_backtest_recompute(spark, sf_oracle):
    daily: dict[dt.date, int] = defaultdict(int)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS d")
        .collect()
    ):
        daily[r["d"]] += 1
    days = sorted(daily)
    want = {}
    for idx, d in enumerate(days):
        prior = days[max(0, idx - 7) : idx]
        if len(prior) == 7:
            s7 = sum(daily[p] for p in prior)
            f = s7 // 7
            want[d.strftime("%Y-%m-%d")] = (daily[d], f, abs(daily[d] - f))
    got = {
        r["day"]: (r["actual"], r["forecast"], r["abs_err"])
        for r in surface51.event_forecast_moving_avg(spark, sf_oracle).collect()
    }
    assert got == want
    # ROWS frame over the observed-days series, not a calendar frame:
    # exactly the days with 7 observed predecessors survive
    assert len(got) == max(0, len(days) - 7)


def test_chao1_formula(spark, sf_oracle):
    counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in [t for t in re.split(r"\s+", r["text"].strip()) if t]:
            counts[r["source"]][w] += 1
    want = {}
    for src, wc in counts.items():
        v = len(wc)
        f1 = sum(1 for c in wc.values() if c == 1)
        f2 = sum(1 for c in wc.values() if c == 2)
        want[src] = (
            v, f1, f2, sum(wc.values()),
            v * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1)),
        )
    got = {
        r["source"]: (r["vocab"], r["f1"], r["f2"], r["n_tokens"], r["chao1_milli"])
        for r in surface51.text_chao1_richness(spark, sf_oracle).collect()
    }
    assert got == want


def test_bounded_funnel_monotone_and_tighter_than_unbounded(spark, sf_oracle):
    row = surface51.event_funnel_time_bounded(spark, sf_oracle).collect()[0]
    assert row["n_view"] >= row["n_click_24h"] >= row["n_purchase_24h"] >= 0
    assert row["n_view"] > 0
    # recompute directly
    ev = [
        (r["user_id"], r["event_type"], r["ts"])
        for r in load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND ts IS NOT NULL")
        .collect()
    ]
    by_user: dict[int, list] = defaultdict(list)
    for u, ty, t in ev:
        by_user[u].append((t, ty))
    n_v = n_c = n_p = 0
    day = dt.timedelta(hours=24)
    for u, evs in by_user.items():
        views = [t for t, ty in evs if ty == "view"]
        if not views:
            continue
        n_v += 1
        v = min(views)
        clicks = [t for t, ty in evs if ty == "click" and v < t <= v + day]
        if not clicks:
            continue
        n_c += 1
        c = min(clicks)
        if any(ty == "purchase" and c < t <= c + day for t, ty in evs):
            n_p += 1
    assert (row["n_view"], row["n_click_24h"], row["n_purchase_24h"]) == (
        n_v, n_c, n_p,
    )
