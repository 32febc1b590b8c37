"""Batch-78 behavior: audio peak recompute, overlap-chunk coverage
invariants, map-HOF relational equivalence, correlated-subquery
decorrelation plan, UDAF run recompute — independent twins."""

from __future__ import annotations

import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface71
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_audio_peaks_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        n = nb % 441 + 100
        s = [((raw[j % nb] - 128) * 256 if nb else 0) for j in range(n)]
        pk = sum(
            1 for j in range(1, n - 1) if s[j] > s[j - 1] and s[j] > s[j + 1]
        )
        a = want[r["source"]]
        a[0] += 1
        a[1] += n
        a[2] += pk
        a[3] += max(n - 2, 0)
    got = {
        r["source"]: (r["n_clips"], r["n_samples"], r["n_peaks"],
                      r["peak_density_ppm"])
        for r in surface71.multimodal_audio_peak_count(
            spark, sf_oracle
        ).collect()
    }
    assert got == {
        k: (c, ns, p, p * 1000000 // i) for k, (c, ns, p, i) in want.items()
    }


def test_overlap_chunks_cover_and_overlap(spark, sf_oracle):
    texts = {
        r["doc_id"]: (r["text"] or "").split()
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    rows = surface71.udtf_overlap_chunks(spark, sf_oracle).collect()
    by_doc = defaultdict(dict)
    for r in rows:
        by_doc[r["doc_id"]][r["win_idx"]] = (r["n_words"], r["chunk"])
    for doc_id, words in texts.items():
        wins = by_doc[doc_id]
        n_wins = max(math.ceil(max(len(words), 1) / 8), 1)
        assert set(wins) == set(range(n_wins))
        for k, (nw, chunk) in wins.items():
            expect = words[k * 8 : k * 8 + 16]
            assert nw == len(expect)
            assert chunk == " ".join(expect)
        # consecutive windows overlap by 8 words (except possibly last)
        for k in range(n_wins - 2):
            a = wins[k][1].split()
            b = wins[k + 1][1].split()
            assert a[8:] == b[:8]


def test_map_hof_equals_relational(spark, sf_oracle):
    cnt = defaultdict(int)
    tot = defaultdict(int)
    for r in load_table(spark, sf_oracle, "events").collect():
        cnt[(r["user_id"], r["event_type"])] += 1
        tot[r["user_id"]] += 1
    want = {
        (u, t): (c, c * 1000000 // tot[u])
        for (u, t), c in cnt.items()
        if c >= 3
    }
    got = {
        (r["user_id"], r["event_type"]): (r["cnt"], r["share_ppm"])
        for r in surface71.hof_map_filter_values(spark, sf_oracle).collect()
    }
    assert got == want


def test_correlated_subq_decorrelates(spark, sf_oracle):
    df = surface71.subq_correlated_scalar_avg(spark, sf_oracle)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # Catalyst decorrelated: an aggregate-join shape, no nested loops
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    spend = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        spend[r["o_custkey"]].append(
            (r["o_orderkey"], int(math.floor(r["o_totalprice"] * 100 + 0.5)))
        )
    want = {
        ok
        for ck, lst in spend.items()
        for ok, c in lst
        if c * len(lst) > sum(v for _, v in lst)
    }
    assert {r["o_orderkey"] for r in rows} == want


def test_udaf_longest_run_recompute(spark, sf_oracle):
    series = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        series[r["l_suppkey"]].append(
            (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
             int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
        )
    want = {}
    for sk, rows in series.items():
        rows.sort()
        best = run = 0
        prev = None
        for _, _, _, c in rows:
            run = run + 1 if prev is not None and c > prev else 1
            best = max(best, run)
            prev = c
        want[sk] = (len(rows), best)
    got = {
        r["l_suppkey"]: (r["n_rows"], r["longest_run"])
        for r in surface71.udaf_longest_increasing_run(
            spark, sf_oracle
        ).collect()
    }
    assert got == want
