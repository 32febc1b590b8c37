"""Batch-84 behavior: 1-NN confusion recompute, hard-negative label
law, roundtrip identity, GROUP BY ALL twin, EOM clamp recompute —
independent twins."""

from __future__ import annotations

import calendar
import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface77
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _vecs(spark, sf_oracle):
    out = {}
    for r in load_table(spark, sf_oracle, "embeddings").collect():
        q = [int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]]
        b = (
            (1 if q[0] > 0 else 0) + (2 if q[1] > 0 else 0)
            + (4 if q[2] > 0 else 0) + (8 if q[3] > 0 else 0)
        )
        out[r["vec_id"]] = (q, b, r["label"])
    return out


def test_knn_confusion_recompute(spark, sf_oracle):
    vecs = _vecs(spark, sf_oracle)
    want = Counter()
    for a, (qa, ba, la) in vecs.items():
        best = None
        for b, (qb, bb, lb) in vecs.items():
            if b == a or bb != ba:
                continue
            d = sum(x * y for x, y in zip(qa, qb))
            if best is None or (-d, b) < best[0]:
                best = ((-d, b), lb)
        pred = str(best[1]) if best else "none"
        want[(la, pred)] += 1
    got = {
        (r["actual"], r["predicted"]): r["n"]
        for r in surface77.embed_knn_classifier_eval(
            spark, sf_oracle
        ).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(vecs)


def test_hard_negatives_label_law(spark, sf_oracle):
    vecs = _vecs(spark, sf_oracle)
    got = {
        r["anchor"]: (r["anchor_label"], r["negative"], r["neg_label"],
                      r["dot"])
        for r in surface77.sample_hard_negatives(spark, sf_oracle).collect()
    }
    for a in got:
        qa, ba, la = vecs[a]
        al, neg, nl, dot = got[a]
        assert al == la and nl != la
        # the reported negative really is the argmax over its class
        best = None
        for b, (qb, bb, lb) in vecs.items():
            if bb != ba or lb == la:
                continue
            d = sum(x * y for x, y in zip(qa, qb))
            if best is None or (-d, b) < best:
                best = (-d, b)
        assert best == (-dot, neg)


def test_roundtrip_identity(spark, sf_oracle):
    rows = surface77.str_to_number_format(spark, sf_oracle).collect()
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        c = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        a = want[r["o_orderstatus"]]
        a[0] += 1
        a[1] += c
        if c >= 100000:  # >= $1,000.00 → grouping comma appears
            a[2] += 1
    got = {
        r["o_orderstatus"]: (r["n"], r["cents_in"], r["cents_roundtrip"],
                             r["n_with_grouping"])
        for r in rows
    }
    assert got == {k: (v[0], v[1], v[1], v[2]) for k, v in want.items()}


def test_group_by_all_twin(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        a = want[(r["l_returnflag"], r["l_linestatus"])]
        a[0] += 1
        a[1] += int(math.floor(r["l_quantity"] + 0.5))
    rows = surface77.sql_group_by_all_sugar(spark, sf_oracle).collect()
    got = {(r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
           for r in rows}
    assert got == {k: tuple(v) for k, v in want.items()}
    # ORDER BY ALL: rows arrive sorted by the full column tuple
    keys = [(r["l_returnflag"], r["l_linestatus"]) for r in rows]
    assert keys == sorted(keys)


def test_eom_clamp_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        ny, nm = (d.year + (d.month == 12), d.month % 12 + 1)
        clamp = d.day > calendar.monthrange(ny, nm)[1]
        a = want[d.day]
        a[0] += 1
        a[1] += 1 if clamp else 0
    got = {
        r["dom"]: (r["n_orders"], r["n_clamped"])
        for r in surface77.date_add_months_eom_semantics(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # clamping only ever happens on days 29-31
    for dom, (_, nc) in got.items():
        assert nc == 0 or dom >= 29
