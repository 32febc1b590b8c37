"""Batch-48 behavior: BM25 vs python recompute (and vs true-float
BM25 ranking sanity), KWIC vs string slicing, postings vs dict index,
bootstrap weights vs threshold inversion, gap stats vs sorted scan."""

from __future__ import annotations

import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface41
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _doc_tokens(spark, sf):
    rows = (
        load_table(spark, sf, "documents").select("doc_id", "text").collect()
    )
    return {r["doc_id"]: r["text"].strip().lower().split() for r in rows}


def test_bm25_matches_integer_recompute(spark, sf_oracle):
    toks = _doc_tokens(spark, sf_oracle)
    terms = ("spark", "query", "table")
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) // n_docs
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["tf_total"], r["bm25_fp"])
        for r in surface41.text_bm25_score(spark, sf_oracle).collect()
    }
    want = {}
    for d, ts in toks.items():
        dl = len(ts)
        score, hit, tftot = 0, 0, 0
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            idf_fp = math.floor(
                math.log((2 * n_docs - 2 * df[q] + 1) / (2 * df[q] + 1)) * 1e6
                + 0.5
            )
            # Spark's div and DuckDB's // both truncate toward ZERO on
            # the negative idf terms (common-word idf < 0); python //
            # floors, so emulate trunc-div here
            num = idf_fp * 22 * avgdl * tf
            den = 10 * avgdl * tf + 3 * avgdl + 9 * dl
            score += -(-num // den) if num < 0 else num // den
            hit += 1
            tftot += tf
        if hit:
            want[d] = (hit, tftot, score)
    assert got == want
    # ranking sanity: the integerized score orders docs like true-float
    # BM25 on the top of the list (spot-check the argmax)
    def float_bm25(d):
        ts = toks[d]
        dl = len(ts)
        s = 0.0
        real_avg = sum(len(t) for t in toks.values()) / n_docs
        for q in terms:
            tf = ts.count(q)
            if tf:
                idf = math.log((2 * n_docs - 2 * df[q] + 1) / (2 * df[q] + 1))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / real_avg))
        return s

    top_int = max(want, key=lambda d: (want[d][2], -d))
    scores_f = {d: float_bm25(d) for d in want}
    top_f = max(scores_f, key=lambda d: (scores_f[d], -d))
    assert top_int == top_f


def test_kwic_matches_slicing(spark, sf_oracle):
    toks = _doc_tokens(spark, sf_oracle)
    want = set()
    for d, ts in toks.items():
        for i, t in enumerate(ts):
            if t == "spark":
                want.add(
                    (
                        d,
                        i,
                        " ".join(ts[max(0, i - 3) : i]),
                        " ".join(ts[i + 1 : i + 4]),
                    )
                )
    got = {
        (r["doc_id"], r["pos0"], r["left_ctx"], r["right_ctx"])
        for r in surface41.text_kwic_context(spark, sf_oracle).collect()
    }
    assert got == want
    assert got  # the fixture vocabulary contains the keyword


def test_postings_match_dict_index(spark, sf_oracle):
    toks = _doc_tokens(spark, sf_oracle)
    tf: dict[str, dict[int, int]] = {}
    for d, ts in toks.items():
        for t in ts:
            if t:
                tf.setdefault(t, {}).setdefault(d, 0)
                tf[t][d] += 1
    got = {
        r["tok"]: (r["df"], r["tf_total"], r["top_doc"], r["top_tf"])
        for r in surface41.text_inverted_postings(spark, sf_oracle).collect()
    }
    want = {}
    for t, docs in tf.items():
        if len(docs) >= 5:
            top = max(docs, key=lambda d: (docs[d], -d))
            want[t] = (len(docs), sum(docs.values()), top, docs[top])
    assert got == want


def test_bootstrap_weights_match_thresholds(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("event_type IS NOT NULL AND value IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    )
    T = surface41._POIS_T
    agg: dict[str, list[int]] = {}
    for r in rows:
        u = int(
            hashlib.md5(f"boot1:{r['event_id']}".encode()).hexdigest()[:15],
            16,
        )
        w = sum(1 for t in T if u >= t)
        cents = math.floor(r["value"] * 100 + 0.5)
        a = agg.setdefault(r["event_type"], [0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += w * cents
    got = {
        r["event_type"]: (r["n"], r["boot_n"], r["boot_cents"])
        for r in surface41.sample_poisson_bootstrap(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # Poisson(1): the replicate size stays near n (law of large numbers)
    for n, bn, _bc in got.values():
        assert 0.8 * n < bn < 1.2 * n


def test_order_gaps_match_sorted_scan(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "orders")
        .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS DATE) d")
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append((r["d"], r["o_orderkey"]))
    got = {
        r["o_custkey"]: (
            r["n_gaps"],
            r["min_gap"],
            r["max_gap"],
            r["median_gap"],
        )
        for r in surface41.event_order_gap_stats(spark, sf_oracle).collect()
    }
    want = {}
    for c, lst in by_cust.items():
        lst.sort()
        gaps = sorted(
            (b[0] - a[0]).days for a, b in zip(lst, lst[1:])
        )
        if gaps:
            want[c] = (
                len(gaps),
                gaps[0],
                gaps[-1],
                gaps[(len(gaps) + 1) // 2 - 1],
            )
    assert got == want
