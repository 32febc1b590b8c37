"""Batch-71 behavior: one-Window-exec law for the named spec,
readability recompute, HTML roundtrip, exact Spearman recompute +
bounds, decade histogram law — independent twins."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface64
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_named_window_plans_one_window_exec(spark, sf_oracle):
    import contextlib
    import io

    df = surface64.sql_named_window_reuse(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Window (") == 1, plan
    # semantics: running sum within each status is monotone
    rows = df.collect()
    last = {}
    for r in sorted(rows, key=lambda r: (r["o_orderstatus"], r["rnk"], r["o_orderkey"])):
        st = r["o_orderstatus"]
        assert r["run_cents"] >= last.get(st, 0)
        last[st] = r["run_cents"]


def test_readability_recompute(spark, sf_oracle):
    acc = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in [t for t in re.split(r"\s+", r["text"].strip()) if t]:
            a = acc[r["source"]]
            a[0] += 1
            a[1] += len(w)
            a[2] += len(re.findall(r"[aeiouy]+", w))
    got = {
        r["source"]: (
            r["n_words"], r["avg_word_len_x100"], r["syllables_per_word_ppm"]
        )
        for r in surface64.text_readability_proxy(spark, sf_oracle).collect()
    }
    assert got == {
        s: (n, tot * 100 // n, syl * 1000000 // n)
        for s, (n, tot, syl) in acc.items()
    }


def test_html_table_roundtrip(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        st = r["o_orderstatus"]
        want[st][0] += 1
        want[st][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
        want[st][2] = max(want[st][2], r["o_orderkey"])
    got = {
        r["status"]: (r["n"], r["sum_cents"], r["max_key"])
        for r in surface64.scan_html_table_regex(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_spearman_recompute_and_bounds(spark, sf_oracle):
    vecs = {
        r["vec_id"]: [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    queries = {k: v for k, v in vecs.items() if k < 5}
    corpus = {k: v for k, v in vecs.items() if k >= 5}
    got = {
        r["q_id"]: (r["n"], r["sum_d2"], r["spearman_ppm"])
        for r in surface64.embed_metric_rank_correlation(spark, sf_oracle).collect()
    }
    for qid, qv in queries.items():
        by_dot = sorted(
            corpus, key=lambda c: (-sum(a * b for a, b in zip(qv, vecs[c])), c)
        )
        by_l2 = sorted(
            corpus,
            key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(qv, vecs[c])), c
            ),
        )
        rd = {c: i + 1 for i, c in enumerate(by_dot)}
        rl = {c: i + 1 for i, c in enumerate(by_l2)}
        n = len(corpus)
        d2 = sum((rd[c] - rl[c]) ** 2 for c in corpus)
        rho = 1000000 - (6 * d2 * 1000000) // (n * (n * n - 1))
        assert got[qid] == (n, d2, rho)
        assert -1_000_000 <= rho <= 1_000_000


def test_decade_histogram_law(spark, sf_oracle):
    want = defaultdict(lambda: [0, None, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        c = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        d = len(str(c)) - 1
        want[d][0] += 1
        want[d][1] = c if want[d][1] is None else min(want[d][1], c)
        want[d][2] = max(want[d][2], c)
    got = {
        r["decade"]: (r["n_orders"], r["min_cents"], r["max_cents"])
        for r in surface64.agg_decade_histogram(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    for d, (_, mn, mx) in got.items():
        assert 10 ** d <= mn and mx < 10 ** (d + 1)
