"""Batch-89 behavior: backfill gap recompute, props stats recompute,
behavior-similarity recompute, brand-fold recompute, paired-terms
recompute — independent twins."""

from __future__ import annotations

import datetime as dt
import json
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface82
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_EPOCH = dt.date(1970, 1, 1)


def test_backfill_plan_recompute(spark, sf_oracle):
    days = set()
    for r in load_table(spark, sf_oracle, "events").collect():
        days.add(r["ts"].date())
    lo, hi = min(days), max(days)
    want = defaultdict(lambda: [0, 0])
    for off in range((hi - lo).days + 1):
        d = lo + dt.timedelta(days=off)
        ym = f"{d.year:04d}-{d.month:02d}"
        want[ym][0] += 1
        if (d - _EPOCH).days % 4 != 0 and d in days:
            want[ym][1] += 1
    got = {
        r["ym"]: (r["n_expected"], r["n_present"], r["n_missing"])
        for r in surface82.date_partition_backfill_plan(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: (e, p, e - p) for k, (e, p) in want.items()}
    # the staged landing zone really lacks the %4 days
    import glob

    path = surface82._staged_gappy_partitions(spark, sf_oracle)
    parts = {
        p.rsplit("day=", 1)[1]
        for p in glob.glob(f"{path}/day=*")
    }
    assert all(
        (dt.date.fromisoformat(d) - _EPOCH).days % 4 != 0 for d in parts
    )


def test_props_stats_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, None, None, set()])
    for r in load_table(spark, sf_oracle, "events").collect():
        a = want[r["event_type"]]
        a[0] += 1
        try:
            k = int(json.loads(r["props"])["k"])
        except Exception:
            k = None
        if k is None:
            a[1] += 1
        else:
            a[2] += k
            a[3] = k if a[3] is None else min(a[3], k)
            a[4] = k if a[4] is None else max(a[4], k)
            a[5].add(k)
    got = {
        r["event_type"]: (r["n"], r["n_null"], r["k_sum"], r["k_min"],
                          r["k_max"], r["k_distinct"])
        for r in surface82.json_props_numeric_stats(
            spark, sf_oracle
        ).collect()
    }
    assert got == {
        t: (a[0], a[1], a[2], a[3], a[4], len(a[5]))
        for t, a in want.items()
    }


def test_behavior_similarity_recompute(spark, sf_oracle):
    types = ["click", "error", "purchase", "signup", "view"]
    vecs = defaultdict(lambda: [0] * 5)
    for r in load_table(spark, sf_oracle, "events").collect():
        vecs[r["user_id"]][types.index(r["event_type"])] += 1
    got = defaultdict(dict)
    for r in surface82.embed_behavior_user_similarity(
        spark, sf_oracle
    ).collect():
        got[r["a"]][r["rnk"]] = (r["b"], r["dot"])
    assert set(got) == {u for u in vecs if u < 20}
    for a, ranks in got.items():
        va = vecs[a]
        scored = sorted(
            (
                (-sum(x * y for x, y in zip(va, vb)), b)
                for b, vb in vecs.items()
                if b != a
            )
        )
        for rnk in (1, 2, 3):
            negd, b = scored[rnk - 1]
            assert ranks[rnk] == (b, -negd)


def test_brand_fold_recompute(spark, sf_oracle):
    groups = defaultdict(lambda: [set(), 0])
    for r in load_table(spark, sf_oracle, "part").collect():
        key = "".join("9" if c.isdigit() else c for c in r["p_brand"])
        g = groups[(key, r["p_type"])]
        g[0].add(r["p_brand"])
        g[1] += 1
    want = sorted(
        (
            (k, t, len(bs), n, min(bs))
            for (k, t), (bs, n) in groups.items()
            if len(bs) >= 2
        ),
        key=lambda r: (-r[2], -r[3], r[0], r[1]),
    )[:20]
    got = [
        (r["brand_key"], r["p_type"], r["n_raw_brands"], r["n_parts"],
         r["example_raw"])
        for r in surface82.str_confusable_fold(spark, sf_oracle).collect()
    ]
    assert got == want
    assert len(got) > 0  # the fold genuinely merges brands


def test_paired_terms_recompute(spark, sf_oracle):
    per = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "events").collect():
        a = per[(r["event_type"], r["user_id"])]
        if r["ts"].day > 15:
            a[0] += 1
        else:
            a[1] += 1
    agg = defaultdict(lambda: [0, 0, 0])
    for (t, _), (post, pre) in per.items():
        d = post - pre
        a = agg[t]
        a[0] += 1
        a[1] += d
        a[2] += d * d
    got = {
        r["event_type"]: (r["n_users"], r["sum_d"], r["sum_d2"],
                          r["mean_diff_sign"])
        for r in surface82.event_pre_post_paired_terms(
            spark, sf_oracle
        ).collect()
    }
    assert got == {
        t: (a[0], a[1], a[2], 1 if a[1] > 0 else (-1 if a[1] < 0 else 0))
        for t, a in agg.items()
    }
