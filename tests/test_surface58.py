"""Batch-65 behavior: ADC = LUT-sum identity + recall readout, drift
recompute, WMA recompute, zstd losslessness, SLA band recompute —
independent twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface58
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _cent(b, c, i):
    h = int(hashlib.md5(f"pq_{b}_{c}_{i}".encode()).hexdigest()[:15], 16)
    return h % 2000001 - 1000000


def test_adc_topk_matches_python(spark, sf_oracle):
    vecs = {
        r["vec_id"]: [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    cents = {
        (b, c): [_cent(b, c, i) for i in range(8)]
        for b in range(8)
        for c in range(4)
    }

    def sub_d(v, b, c):
        return sum((v[b * 8 + i] - cents[(b, c)][i]) ** 2 for i in range(8))

    queries = {k: v for k, v in vecs.items() if k < 5}
    corpus = {k: v for k, v in vecs.items() if k >= 5}
    codes = {
        cid: [
            min(range(4), key=lambda c: (sub_d(v, b, c), c)) for b in range(8)
        ]
        for cid, v in corpus.items()
    }
    want = {}
    for qid, qv in queries.items():
        adc_rank = sorted(
            corpus,
            key=lambda cid: (
                sum(sub_d(qv, b, codes[cid][b]) for b in range(8)),
                cid,
            ),
        )[:10]
        exact_rank = sorted(
            corpus,
            key=lambda cid: (
                sum((a - b) ** 2 for a, b in zip(qv, corpus[cid])),
                cid,
            ),
        )[:10]
        want[qid] = (
            ",".join(str(x) for x in sorted(adc_rank)),
            ",".join(str(x) for x in sorted(exact_rank)),
            len(set(adc_rank) & set(exact_rank)),
        )
    got = {
        r["q_id"]: (r["top10_adc"], r["top10_exact"], r["n_overlap"])
        for r in surface58.embed_pq_adc_topk(spark, sf_oracle).collect()
    }
    assert got == want


def test_vocab_drift_recompute(spark, sf_oracle):
    counts = {"a": defaultdict(int), "b": defaultdict(int)}
    for r in load_table(spark, sf_oracle, "documents").collect():
        half = "a" if int(re.search(r"(\d+)$", r["source"]).group(1)) < 10 else "b"
        for w in [t for t in re.split(r"\s+", r["text"].strip()) if t]:
            counts[half][w] += 1
    tot = {h: sum(c.values()) for h, c in counts.items()}
    words = set(counts["a"]) | set(counts["b"])
    ranked = sorted(
        (
            (
                abs(
                    counts["a"].get(w, 0) * 1000000 // tot["a"]
                    - counts["b"].get(w, 0) * 1000000 // tot["b"]
                ),
                w,
            )
            for w in words
        ),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [
        (r["drift_ppm"], r["w"])
        for r in surface58.text_vocab_drift_topk(spark, sf_oracle).collect()
    ]
    assert got == ranked


def test_wma_recompute(spark, sf_oracle):
    daily = defaultdict(int)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL")
        .selectExpr("CAST(ts AS DATE) AS d")
        .collect()
    ):
        daily[r["d"]] += 1
    days = sorted(daily)
    want = {}
    for idx in range(6, len(days)):
        window = [daily[days[idx - k]] for k in range(7)]  # newest first
        wsum = sum(v * (7 - k) for k, v in enumerate(window))
        want[days[idx].strftime("%Y-%m-%d")] = (
            daily[days[idx]], wsum, wsum // 28
        )
    got = {
        r["day"]: (r["actual"], r["wsum"], r["wma"])
        for r in surface58.window_weighted_moving_avg(spark, sf_oracle).collect()
    }
    assert got == want


def test_zstd_roundtrip_lossless(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        f = r["l_returnflag"]
        want[f][0] += 1
        want[f][1] += int(r["l_quantity"])
        want[f][2] += int(math.floor(r["l_extendedprice"] * 100 + 0.5))
    got = {
        r["l_returnflag"]: (r["n"], r["sum_qty"], r["sum_cents"])
        for r in surface58.sink_parquet_zstd_roundtrip(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_sla_bands_recompute(spark, sf_oracle):
    orders = {
        r["o_orderkey"]: (r["o_orderdate"].date(), r["o_orderpriority"])
        for r in load_table(spark, sf_oracle, "orders").collect()
    }
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        od, pr = orders[r["l_orderkey"]]
        days = (r["l_shipdate"].date() - od).days
        if days < 0:
            continue
        band = (
            "0-7" if days <= 7 else
            "8-30" if days <= 30 else
            "31-90" if days <= 90 else "90+"
        )
        want[(pr, band)][0] += 1
        want[(pr, band)][1] = max(want[(pr, band)][1], days)
    got = {
        (r["o_orderpriority"], r["sla_band"]): (r["n_lines"], r["max_days"])
        for r in surface58.date_sla_buckets(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len({b for _, b in want}) == 4  # all four bands occur
