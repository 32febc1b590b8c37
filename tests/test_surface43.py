"""Batch-50 behavior: unigram surprisal vs corpus-count recompute,
hex codec vs binascii, flatten losslessness, quarter rollup vs month
arithmetic, z-score outlier vs integer recompute."""

from __future__ import annotations

import binascii
import math

from historic_score_etl_pipeline_spark.contract import surface43
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_unigram_surprisal_matches_corpus_counts(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "text")
        .collect()
    )
    corpus: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    for r in docs:
        d = per_doc.setdefault(r["doc_id"], {})
        for t in r["text"].strip().lower().split():
            if t:
                corpus[t] = corpus.get(t, 0) + 1
                d[t] = d.get(t, 0) + 1
    T = sum(corpus.values())
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_fp"], r["mean_unats"])
        for r in surface43.text_doc_surprisal_unigram(spark, sf_oracle).collect()
    }
    for did, tf in per_doc.items():
        n = sum(tf.values())
        s = sum(
            c * math.floor(math.log(T / corpus[t]) * 1e6 + 0.5)
            for t, c in tf.items()
        )
        assert got[did] == (n, s, s // n), did
    # rarer-vocabulary docs score higher: the max-mean doc uses tokens
    # with strictly lower average corpus frequency than the min-mean doc
    hi = max(got, key=lambda d: got[d][2])
    lo = min(got, key=lambda d: got[d][2])
    avg_freq = lambda d: sum(  # noqa: E731
        corpus[t] * c for t, c in per_doc[d].items()
    ) / sum(per_doc[d].values())
    assert avg_freq(hi) < avg_freq(lo)


def test_hex_roundtrip_matches_binascii(spark, sf_oracle):
    got = {
        r["p_partkey"]: (
            r["hex_rec"], r["hex_len"], r["roundtrip_ok"], r["first_byte"]
        )
        for r in surface43.str_hex_unhex_roundtrip(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "part")
        .select("p_partkey", "p_brand")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        rec = f"{r['p_partkey']}|{r['p_brand']}"
        hx = binascii.hexlify(rec.encode()).decode().upper()
        assert got[r["p_partkey"]] == (hx, len(hx), True, rec.encode()[0])


def test_flatten_is_lossless_everywhere(spark, sf_oracle):
    rows = surface43.array_flatten_nested(spark, sf_oracle).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    assert len(rows) == len(docs) > 0
    for r in rows:
        toks = docs[r["doc_id"]].strip().lower().split()
        assert r["lossless"] is True
        assert r["n_tokens"] == len(toks)
        assert r["n_chunks"] == (len(toks) + 9) // 10
        assert r["last_token"] == toks[-1]


def test_quarter_rollup_groups_by_quarter(spark, sf_oracle):
    rows = surface43.agg_quarter_rollup(spark, sf_oracle).collect()
    orders = (
        load_table(spark, sf_oracle, "orders")
        .selectExpr("CAST(o_orderdate AS DATE) AS d", "o_totalprice")
        .collect()
    )
    want: dict[str, int] = {}
    for r in orders:
        d = r["d"]
        qm = (d.month - 1) // 3 * 3 + 1
        key = f"{d.year:04d}-{qm:02d}-01"
        want[key] = want.get(key, 0) + 1
    got = {r["quarter_start"]: r["n_orders"] for r in rows}
    assert got == want
    for r in rows:
        assert r["quarter_start"].endswith(("-01-01", "-04-01", "-07-01", "-10-01"))


def test_zscore_outlier_matches_integer_recompute(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings").collect()
    fix = lambda x: math.floor(float(x) * 1e6 + 0.5)  # noqa: E731
    dims: dict[int, list[int]] = {}
    for r in emb:
        for i, x in enumerate(r["embedding"]):
            dims.setdefault(i, []).append(fix(x))
    stats = {
        i: (len(v), sum(v), sum(x * x for x in v)) for i, v in dims.items()
    }
    got = {
        r["vec_id"]: (r["z2_sum_ppm"], r["z2_max_ppm"], r["worst_dim"])
        for r in surface43.embed_zscore_outlier(spark, sf_oracle).collect()
    }
    for r in emb:
        terms = []
        for i, x in enumerate(r["embedding"]):
            n, s, q = stats[i]
            var6 = (n * q - s * s) // 1_000_000
            v = fix(x)
            z2 = ((n * v - s) ** 2) // var6 if var6 > 0 else 0
            terms.append((z2, i))
        total = sum(z for z, _ in terms)
        zmax = max(z for z, _ in terms)
        worst = max(terms, key=lambda t: t[0] * 1000 - t[1])[1]
        assert got[r["vec_id"]] == (total, zmax, worst), r["vec_id"]
