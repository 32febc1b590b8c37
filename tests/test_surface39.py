"""Batch-46 behavior: prefix pairs vs brute-force scan, trigram ratio
vs python slicing, Heaps curve vs first-seen dict, dim stats vs loops,
nearest-centroid vs numpy-free argmin — recompute twins."""

from __future__ import annotations

import math

from historic_score_etl_pipeline_spark.contract import surface39
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _docs(spark, sf):
    return (
        load_table(spark, sf, "documents")
        .select("doc_id", "text")
        .collect()
    )


def test_prefix_truncation_matches_brute_force(spark, sf_oracle):
    rows = _docs(spark, sf_oracle)
    texts = {r["doc_id"]: r["text"].strip().lower() for r in rows}
    want = set()
    for fa, ta in texts.items():
        for fb, tb in texts.items():
            if fa == fb or len(ta) <= len(tb):
                continue
            # the operator's blocking gate: ≥5 shared head tokens
            if (
                ta.startswith(tb)
                and " ".join(ta.split()[:5]) == " ".join(tb.split()[:5])
            ):
                want.add((fa, fb, len(ta), len(tb)))
    got = {
        (r["full_id"], r["trunc_id"], r["full_chars"], r["trunc_chars"])
        for r in surface39.dedup_prefix_truncation(spark, sf_oracle).collect()
    }
    assert got == want
    assert got  # the fixture contains real truncation pairs


def test_trigram_diversity_matches_python(spark, sf_oracle):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"], r["diversity_ppm"])
        for r in surface39.text_trigram_diversity(spark, sf_oracle).collect()
    }
    for r in _docs(spark, sf_oracle):
        t = r["text"].strip().lower()
        if len(t) < 3:
            assert r["doc_id"] not in got
            continue
        grams = [t[i : i + 3] for i in range(len(t) - 2)]
        want = (
            len(grams),
            len(set(grams)),
            len(set(grams)) * 1_000_000 // len(grams),
        )
        assert got[r["doc_id"]] == want


def test_vocab_growth_matches_first_seen(spark, sf_oracle):
    rows = _docs(spark, sf_oracle)
    first: dict[str, int] = {}
    occ: dict[int, int] = {}
    docs_in: dict[int, set] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        b = r["doc_id"] // 50
        toks = [t for t in r["text"].strip().lower().split() if t]
        occ[b] = occ.get(b, 0) + len(toks)
        docs_in.setdefault(b, set()).add(r["doc_id"])
        for t in toks:
            if t not in first:
                first[t] = r["doc_id"]
    new_per: dict[int, int] = {}
    for t, d in first.items():
        new_per[d // 50] = new_per.get(d // 50, 0) + 1
    got = sorted(
        surface39.text_vocab_growth(spark, sf_oracle).collect(),
        key=lambda r: r["bucket"],
    )
    cum = 0
    assert len(got) == len(occ)
    for r in got:
        b = r["bucket"]
        cum += new_per.get(b, 0)
        assert (
            r["n_docs"],
            r["n_tokens"],
            r["new_vocab"],
            r["cum_vocab"],
        ) == (len(docs_in[b]), occ[b], new_per.get(b, 0), cum), b
    assert cum == len(first)


def test_dim_stats_match_python(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings").collect()
    fix = lambda x: math.floor(float(x) * 1e6 + 0.5)  # noqa: E731
    dims: dict[int, list[int]] = {}
    for r in emb:
        for i, x in enumerate(r["embedding"]):
            dims.setdefault(i, []).append(fix(x))
    got = {
        r["dim"]: (r["n"], r["sum_fp"], r["sumsq_fp"], r["min_fp"], r["max_fp"])
        for r in surface39.embed_dim_stats_exact(spark, sf_oracle).collect()
    }
    assert set(got) == set(dims)
    for d, vs in dims.items():
        assert got[d] == (
            len(vs),
            sum(vs),
            sum(v * v for v in vs),
            min(vs),
            max(vs),
        )


def test_nearest_centroid_matches_argmin(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings").collect()
    fix = lambda x: math.floor(float(x) * 1e6 + 0.5)  # noqa: E731
    by_label: dict[int, list[list[int]]] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            [fix(x) for x in r["embedding"]]
        )
    cents: dict[int, list[int]] = {}
    for lab, vecs in by_label.items():
        n = len(vecs)
        cents[lab] = [sum(col) // n for col in zip(*vecs)]
    got = {
        r["vec_id"]: (
            r["true_label"],
            r["pred_label"],
            r["best_d2"],
            r["margin_d2"],
            r["correct"],
        )
        for r in surface39.embed_nearest_centroid(spark, sf_oracle).collect()
    }
    n_correct = 0
    for r in emb:
        v = [fix(x) for x in r["embedding"]]
        ds = sorted(
            (sum((a - c) ** 2 for a, c in zip(v, cent)), lab)
            for lab, cent in cents.items()
        )
        (best, pred), (second, _l2) = ds[0], ds[1]
        want = (r["label"], pred, best, second - best, pred == r["label"])
        assert got[r["vec_id"]] == want, r["vec_id"]
        n_correct += want[4]
    # sanity: the classifier beats chance on the fixture (10 labels)
    assert n_correct > len(emb) // 10
