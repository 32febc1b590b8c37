"""Batch-24 behavior: 13-gram decontamination against a from-scratch
Python recompute, mixture-budget greedy-fill invariants, reservoir
uniformity/determinism, and token-entropy exactness
(contract/surface18.py, operators/dedup.py, operators/text.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface18
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def test_decontaminate_matches_python_recompute(spark, sf_oracle):
    """Flagged train docs, hit counts, and the lexicographic witness must
    equal a direct Python set-intersection model of the same corpus."""
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("doc_id", "source", "text").collect()
    n = surface18._NGRAM

    def grams(text: str) -> set[str]:
        t = _py_tokens(text)
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    eval_grams: set[str] = set()
    train: dict[int, set[str]] = {}
    for r in rows:
        g = grams(r["text"])
        if r["source"] == surface18._EVAL_SOURCE:
            eval_grams |= g
        else:
            train[r["doc_id"]] = g
    expected = {
        doc_id: (len(hit), min(hit))
        for doc_id, g in train.items()
        if (hit := g & eval_grams)
    }

    got = {
        r["train_id"]: (r["n_hit_grams"], r["first_hit_gram"])
        for r in surface18.dedup_decontaminate_13gram(spark, sf_oracle).collect()
    }
    assert got == expected
    assert len(got) > 0  # the synthetic corpus does contain contamination


def test_decontaminate_never_flags_eval_docs(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    eval_ids = {
        r["doc_id"]
        for r in docs.where(
            F.col("source") == surface18._EVAL_SOURCE
        ).collect()
    }
    flagged = {
        r["train_id"]
        for r in surface18.dedup_decontaminate_13gram(spark, sf_oracle).collect()
    }
    assert not (flagged & eval_ids)


def test_mixture_budget_greedy_fill_invariants(spark, sf_oracle):
    """Per source: kept docs are exactly the md5-priority prefix; every
    kept doc starts under budget; the FIRST dropped doc (if any) starts
    at or past budget — i.e. the cut is a prefix, not a subset."""
    out = surface18.sample_mixture_budget(spark, sf_oracle).collect()
    docs = load_table(spark, sf_oracle, "documents")
    all_rows = docs.select("doc_id", "source", "text").collect()

    def budget(source: str) -> int:
        return surface18._MIX_BUDGETS.get(source, surface18._MIX_DEFAULT)

    import hashlib

    by_source: dict[str, list[tuple[str, int, int]]] = {}
    for r in all_rows:
        pri = hashlib.md5(
            (surface18._MIX_SEED + str(r["doc_id"])).encode()
        ).hexdigest()
        by_source.setdefault(r["source"], []).append(
            (pri, r["doc_id"], len(_py_tokens(r["text"])))
        )

    expected: dict[tuple[int, str], tuple[int, int]] = {}
    for source, lst in by_source.items():
        lst.sort()
        cum = 0
        for _pri, doc_id, n_tok in lst:
            if cum < budget(source):
                expected[(doc_id, source)] = (n_tok, cum)
            cum += n_tok

    got = {
        (r["doc_id"], r["source"]): (r["n_tokens"], r["cum_before"])
        for r in out
    }
    assert got == expected
    # both paths exercised: some source keeps everything, some source cuts
    kept_per_source = {s: 0 for s in by_source}
    for (_d, s) in got:
        kept_per_source[s] += 1
    assert any(kept_per_source[s] < len(by_source[s]) for s in by_source)


def test_reservoir_is_k_per_group_and_deterministic(spark, sf_oracle):
    out1 = surface18.sample_reservoir_hash(spark, sf_oracle).collect()
    out2 = surface18.sample_reservoir_hash(spark, sf_oracle).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_group: dict[str, set[int]] = {}
    for r in out1:
        per_group.setdefault(r["event_type"], set()).add(r["event_id"])
        assert 1 <= r["rk"] <= surface18._RESERVOIR_K
    ev = load_table(spark, sf_oracle, "events")
    sizes = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for etype, ids in per_group.items():
        assert len(ids) == min(surface18._RESERVOIR_K, sizes[etype])


def test_token_entropy_matches_python_recompute(spark, sf_oracle):
    """Fixed-point per-term rounding then integer sum — must equal the
    from-scratch Python model regardless of Spark partitioning."""
    from historic_score_etl_pipeline_spark.operators.text import token_entropy

    docs = load_table(spark, sf_oracle, "documents")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    expected: dict[int, tuple[int, int, int]] = {}
    for doc_id, text in rows.items():
        toks = _py_tokens(text)
        if not toks:
            continue
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        n = len(toks)
        s = sum(
            int(math.floor((c / n) * math.log(n / c) * 1e6 + 0.5))
            for c in counts.values()
        )
        expected[doc_id] = (n, len(counts), s)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_types"], r["entropy_unats"])
        for r in token_entropy(docs, "doc_id", "text").collect()
    }
    assert got == expected


def test_token_entropy_bounds(spark, sf_oracle):
    """0 ≤ H ≤ ln(n_types) (+1 unat slack for per-term rounding); a
    single-token doc has exactly zero entropy."""
    from historic_score_etl_pipeline_spark.operators.text import token_entropy

    docs = load_table(spark, sf_oracle, "documents")
    for r in token_entropy(docs, "doc_id", "text").collect():
        h = r["entropy_unats"]
        assert h >= 0
        cap = math.log(r["n_types"]) * 1e6 + r["n_types"]  # rounding slack
        assert h <= cap
        if r["n_types"] == 1:
            assert h == 0
