"""Batch-23 behavior: bigram-surprisal exactness against a direct Python
recompute, chunk-window coverage invariants, and substring-span pair
semantics (contract/surface17.py, operators/text.py, operators/dedup.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def test_bigram_surprisal_matches_python_recompute(spark, sf_oracle):
    """The fixed-point micro-nat sum must equal a from-scratch Python
    model of the same corpus — independent of Spark's partitioning or
    summation order (integer sums are associative)."""
    from historic_score_etl_pipeline_spark.operators.text import bigram_surprisal

    docs = load_table(spark, sf_oracle, "documents")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    c2: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab: set[str] = set()
    doc_pairs: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in rows.items():
        toks = _py_tokens(text)
        vocab.update(toks)
        pairs = list(zip(toks, toks[1:]))
        doc_pairs[doc_id] = pairs
        for w1, w2 in pairs:
            c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    V = len(vocab)

    expected: dict[int, tuple[int, int]] = {}
    for doc_id, pairs in doc_pairs.items():
        if not pairs:
            continue
        s = 0
        for w1, w2 in pairs:
            p = (c2[(w1, w2)] + 1.0) / (c1[w1] + float(V))
            s += int(math.floor(-math.log(p) * 1e6 + 0.5))
        expected[doc_id] = (len(pairs), s)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_unats"])
        for r in bigram_surprisal(docs, "doc_id", "text").collect()
    }
    assert got == expected


def test_chunk_windows_cover_every_token_exactly(spark, sf_oracle):
    """Invariants per doc: chunk starts are 0, stride, 2·stride, …;
    every token index is covered by ≥1 chunk; reconstructing the token
    stream from stride-aligned prefixes of each chunk reproduces the
    document exactly."""
    from historic_score_etl_pipeline_spark.operators.text import chunk_windows

    size, stride = 32, 24
    docs = load_table(spark, sf_oracle, "documents")
    out = chunk_windows(docs, "doc_id", "text", size=size, stride=stride)
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    n_docs_with_tokens = sum(1 for t in texts.values() if _py_tokens(t))
    assert len(by_doc) == n_docs_with_tokens

    for doc_id, chunks in by_doc.items():
        toks = _py_tokens(texts[doc_id])
        chunks.sort(key=lambda r: r["chunk_idx"])
        rebuilt: list[str] = []
        for k, r in enumerate(chunks):
            assert r["chunk_idx"] == k
            assert r["start"] == k * stride
            body = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert body == toks[r["start"] : r["start"] + size]
            assert r["n_chunk_tokens"] == len(body)
            assert 0 < len(body) <= size
            rebuilt.extend(body[: stride] if k < len(chunks) - 1 else body)
        # overlapping tails trimmed → exact reconstruction
        assert rebuilt == toks
        # last chunk starts before the end → no empty trailing chunk
        assert chunks[-1]["start"] < len(toks)


def test_substring_span_pairs_semantics(spark, sf_oracle):
    """Each reported pair must actually share a verbatim n-gram at the
    reported offsets, the pair must be ordered, and a brute-force Python
    recompute of the pair set (with the same max_df guard) must agree."""
    from historic_score_etl_pipeline_spark.operators.dedup import (
        substring_span_pairs,
    )

    n, max_df = 8, 20
    docs = load_table(spark, sf_oracle, "documents")
    texts = {r["doc_id"]: _py_tokens(r["text"]) for r in docs.collect()}

    occ: dict[str, dict[int, int]] = {}
    for doc_id, toks in texts.items():
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            occ.setdefault(g, {}).setdefault(doc_id, i)
    expected: dict[tuple[int, int], list[int]] = {}
    for g, docs_of_g in occ.items():
        if not (2 <= len(docs_of_g) <= max_df):
            continue
        ids = sorted(docs_of_g)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                cur = expected.setdefault((a, b), [0, 10**9, 10**9])
                cur[0] += 1
                cur[1] = min(cur[1], docs_of_g[a])
                cur[2] = min(cur[2], docs_of_g[b])

    got = {}
    for r in substring_span_pairs(docs, "doc_id", "text", n=n, max_df=max_df).collect():
        assert r["doc_a"] < r["doc_b"]
        # the reported offsets really hold a shared gram
        ta, tb = texts[r["doc_a"]], texts[r["doc_b"]]
        got[(r["doc_a"], r["doc_b"])] = [
            r["n_shared_grams"], r["first_start_a"], r["first_start_b"],
        ]
    assert got == expected
    assert got, "fixture corpus should contain shared 8-grams"


def test_chunk_windows_rejects_bad_params(spark, sf_oracle):
    from historic_score_etl_pipeline_spark.operators.text import chunk_windows

    docs = load_table(spark, sf_oracle, "documents")
    with pytest.raises(ValueError):
        chunk_windows(docs, "doc_id", "text", size=0)
    with pytest.raises(ValueError):
        chunk_windows(docs, "doc_id", "text", stride=-1)


def test_sample_temperature_plan_has_no_bnlj(spark, sf_oracle):
    """Regression for the fleet red-flag budget: the quota scalar is
    folded on the driver, so the plan must contain no
    BroadcastNestedLoopJoin and no SinglePartition exchange."""
    from historic_score_etl_pipeline_spark.contract.surface16 import (
        sample_temperature,
    )

    df = sample_temperature(spark, sf_oracle)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan


def test_semantic_dedup_invariants(spark, sf_oracle):
    """SemDedup semantics: every flagged doc has a lower-id same-cluster
    witness with cosine >= threshold (verified by numpy recompute), every
    surviving pair within a cluster sits below the threshold, and dup_of
    is the smallest such witness."""
    import numpy as np

    from historic_score_etl_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    threshold = 0.35  # fixture embeddings max pairwise cosine is ~0.51
    emb = load_table(spark, sf_oracle, "embeddings")
    out = semantic_dedup(
        emb, "vec_id", "embedding", k=16, iters=2, threshold=threshold
    ).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    assert len(out) == len(vecs)

    def cos4(a, b):
        va, vb = vecs[a], vecs[b]
        return round(
            float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4
        )

    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    n_dups = 0
    for members in by_cluster.values():
        ids = sorted(m["vec_id"] for m in members)
        for m in members:
            if m["is_dup"]:
                n_dups += 1
                witnesses = [
                    a for a in ids
                    if a < m["vec_id"] and cos4(a, m["vec_id"]) >= threshold
                ]
                assert witnesses and m["dup_of"] == min(witnesses)
            else:
                assert m["dup_of"] is None
        survivors = [m["vec_id"] for m in members if not m["is_dup"]]
        for i, a in enumerate(survivors):
            for b in survivors[i + 1 :]:
                assert cos4(min(a, b), max(a, b)) < threshold
    assert n_dups > 0, "fixture embeddings should contain semantic dups"
