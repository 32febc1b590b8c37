"""Batch-93 behavior: consistency recompute, autocomplete recompute,
NULL-placement law, inventory byte law, runs recompute — independent
twins."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface86
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_consistency_recompute(spark, sf_oracle):
    lsum = Counter()
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        lsum[r["l_orderkey"]] += int(
            math.floor(r["l_extendedprice"] * 100 + 0.5)
        )
    want = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        k = r["o_orderkey"]
        if k in lsum:
            a[1] += 1
            delta = abs(
                int(math.floor(r["o_totalprice"] * 100 + 0.5)) - lsum[k]
            )
            if delta <= 1:
                a[2] += 1
            a[3] += delta
    got = {
        r["o_orderstatus"]: (r["n_orders"], r["n_with_lines"],
                             r["n_consistent"], r["sum_abs_delta"])
        for r in surface86.audit_order_line_consistency(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_autocomplete_recompute(spark, sf_oracle):
    wc = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if len(w) >= 3:
                wc[w] += 1
    by_prefix = defaultdict(list)
    for w, n in wc.items():
        by_prefix[w[:3]].append((-n, w))
    got = {
        r["prefix"]: (r["n_candidates"], r["n_occurrences"], r["top_word"],
                      r["top_count"])
        for r in surface86.text_prefix_autocomplete_topk(
            spark, sf_oracle
        ).collect()
    }
    assert set(got) == set(by_prefix)
    for p, lst in by_prefix.items():
        lst.sort()
        negn, top = lst[0]
        assert got[p] == (
            len(lst), sum(-x for x, _ in lst), top, -negn,
        )


def test_nulls_last_placement(spark, sf_oracle):
    rows = surface86.sql_nulls_ordering_pinned(spark, sf_oracle).collect()
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    # exactly one NULL delta (the first day) and it ranks LAST
    nulls = [r for r in rows if r["delta"] is None]
    assert len(nulls) == 1
    assert by_rank[-1]["delta"] is None
    # non-null deltas are ascending in rank order
    deltas = [r["delta"] for r in by_rank if r["delta"] is not None]
    assert deltas == sorted(deltas)


def test_inventory_byte_law(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += len(str(r["o_orderkey"])) + 1
        a[1] += 1
    got = {
        r["status"]: (r["bytes"], r["n_records"])
        for r in surface86.scan_file_inventory(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_runs_recompute(spark, sf_oracle):
    series = defaultdict(list)
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        if r["l_suppkey"] < 10:
            series[r["l_suppkey"]].append(
                (r["l_shipdate"], r["l_orderkey"], r["l_linenumber"],
                 int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
            )
    want = {}
    for sk, rows in series.items():
        vals = sorted(c for _, _, _, c in rows)
        med = vals[(len(vals) + 1) // 2 - 1]
        rows.sort()
        signs = [1 if c > med else 0 for _, _, _, c in rows]
        n_runs = sum(
            1
            for i, s in enumerate(signs)
            if i == 0 or signs[i - 1] != s
        )
        want[sk] = (sum(signs), len(signs) - sum(signs), n_runs)
    got = {
        r["l_suppkey"]: (r["n_plus"], r["n_minus"], r["n_runs"])
        for r in surface86.window_runs_test_terms(spark, sf_oracle).collect()
    }
    assert got == want
    # runs are bounded: 1 <= runs <= n
    for np, nm, nr in got.values():
        assert 1 <= nr <= np + nm
