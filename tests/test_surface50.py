"""Batch-57 behavior: parse_url vs urllib, outer-explode NULL
preservation, closed-form business days vs numpy busday_count, RAKE
recompute, BY-NAME union null-fill — independent python twins."""

from __future__ import annotations

import re
from collections import defaultdict
from urllib.parse import urlparse, parse_qs

import numpy as np

from historic_score_etl_pipeline_spark.contract import surface50
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_parse_url_matches_urllib(spark, sf_oracle):
    rows = surface50.str_parse_url_parts(spark, sf_oracle).collect()
    assert rows
    for r in rows[:500]:
        u = urlparse(r["url"])
        assert r["host"] == u.hostname
        assert r["path"] == u.path
        assert r["q_st"] == parse_qs(u.query)["st"][0]
        assert r["fragment"] == u.fragment


def test_explode_outer_preserves_empty_docs(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text"
    ).collect()
    want = defaultdict(list)
    empties = 0
    for r in docs:
        toks = [
            t for t in re.split(r"\s+", r["text"].strip()) if len(t) >= 8
        ]
        if not toks:
            empties += 1
            want[r["doc_id"]].append((None, None))
        else:
            for i, t in enumerate(toks):
                want[r["doc_id"]].append((i, t))
    got = defaultdict(list)
    for r in surface50.array_explode_outer_null(spark, sf_oracle).collect():
        got[r["doc_id"]].append((r["pos"], r["token"]))
    assert {k: sorted(v, key=str) for k, v in got.items()} == {
        k: sorted(v, key=str) for k, v in want.items()
    }
    # the law is only exercised if some docs genuinely have no long tokens
    assert empties > 0


def test_business_days_match_numpy(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    orders = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"])
        for r in load_table(spark, sf_oracle, "orders").collect()
    }
    acc = defaultdict(list)
    for r in li:
        od, pr = orders[r["l_orderkey"]]
        d1 = np.datetime64(od.date())
        d2 = np.datetime64(r["l_shipdate"].date())
        if d2 >= d1:
            acc[pr].append(int(np.busday_count(d1, d2)))
    got = {
        r["o_orderpriority"]: (
            r["n_lines"], r["sum_bdays"], r["min_bdays"], r["max_bdays"]
        )
        for r in surface50.date_business_days(spark, sf_oracle).collect()
    }
    assert got == {
        pr: (len(v), sum(v), min(v), max(v)) for pr, v in acc.items()
    }


def test_rake_matches_python(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select("text").collect()
    phrases = []  # list of token tuples
    for r in docs:
        cur = []
        for t in [x for x in re.split(r"\s+", r["text"].strip()) if x]:
            if t in ("a", "the"):
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(tuple(cur))
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    def score(p):
        return sum((deg[w] * 1000) // freq[w] for w in p)
    per_phrase = defaultdict(int)
    for p in phrases:
        per_phrase[" ".join(p)] += 1
    ranked = sorted(
        ((score(tuple(k.split(" "))), k) for k in per_phrase),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    want = [(k, per_phrase[k], s) for s, k in ranked]
    got = [
        (r["phrase"], r["n_occ"], r["score"])
        for r in surface50.text_rake_phrases(spark, sf_oracle).collect()
    ]
    assert got == want
    assert len(got) == 20


def test_union_by_name_null_fills(spark, sf_oracle):
    df = surface50.setop_union_by_name(spark, sf_oracle)
    assert df.columns == ["rec_id", "src", "kind", "cents", "user_id", "priority"]
    ev = df.where("src = 'events'")
    od = df.where("src = 'orders'")
    assert ev.where("priority IS NOT NULL").count() == 0
    assert od.where("user_id IS NOT NULL").count() == 0
    assert od.where("priority IS NULL").count() == 0
    n_ev = (
        load_table(spark, sf_oracle, "events")
        .where("value IS NOT NULL")
        .count()
    )
    n_od = load_table(spark, sf_oracle, "orders").count()
    assert ev.count() == n_ev and od.count() == n_od
