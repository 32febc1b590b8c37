"""Batch 19 — training-data curation operators: semantic properties beyond
the oracle hash (packing invariants, redaction completeness, contamination
recall, sampling determinism, shuffle layout)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract.surface14 import (
    _EMAIL_RE,
    _PHONE_RE,
    _SHARD_TOKENS,
    dedup_contamination,
    dedup_pipeline_e2e,
    sample_stratified_hash,
    shuffle_shard_pos,
    text_pack_shards,
    text_pii_redact,
)


def test_pack_shards_budget_invariant(spark, sf_oracle):
    """A doc's shard is its exclusive running-token-count divided by the
    budget — so every shard's first doc starts strictly inside the
    shard's token range, and shard ids per language are a contiguous
    0..max range."""
    rows = text_pack_shards(spark, sf_oracle).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        seen_shards = set()
        for r in docs:
            assert r["shard_id"] == cum // _SHARD_TOKENS, (lang, r)
            cum += r["n_tokens"]
            seen_shards.add(r["shard_id"])
        assert seen_shards == set(range(max(seen_shards) + 1))


def test_pii_redact_leaves_no_pii(spark, sf_oracle):
    df = text_pii_redact(spark, sf_oracle)
    out = df.collect()
    email = re.compile(_EMAIL_RE)
    phone = re.compile(_PHONE_RE)
    for r in out:
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert not email.search(r["redacted"]), r["redacted"]
        assert not phone.search(r["redacted"]), r["redacted"]
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]


def test_contamination_finds_every_planted_excerpt(spark, sf_oracle):
    """Each eval excerpt is cut from a real train doc at a stride-aligned
    offset — the scan must flag (source, eval) for every eval doc long
    enough to yield two chunks."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    eligible = {
        r["doc_id"]
        for r in docs.where(
            (F.col("doc_id") % 50 == 0)
            # excerpt needs ≥ 2 chunk windows: 49 + 32 + 16 chars of text
            & (F.length("text") >= 49 + 32 + 16)
        ).collect()
    }
    found = dedup_contamination(spark, sf_oracle)
    self_hits = {
        r["eval_id"]
        for r in found.where(F.col("train_id") == F.col("eval_id")).collect()
    }
    assert eligible <= self_hits, eligible - self_hits


def test_stratified_sampling_matches_local_recompute(spark, sf_oracle):
    """The md5-threshold sample is engine-independent: recompute the kept
    set in pure Python and demand exact per-language equality."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").collect()
    rates = {"en": "28", "de": "7f"}
    expected: dict[str, int] = {}
    for r in docs:
        thr = rates.get(r["lang"], "0f")
        if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2] <= thr:
            expected[r["lang"]] = expected.get(r["lang"], 0) + 1
    got = {
        r["lang"]: r["n_kept"]
        for r in sample_stratified_hash(spark, sf_oracle).collect()
    }
    assert got == expected


def test_shuffle_shard_layout(spark, sf_oracle):
    """Shards are 0..7; positions within a shard are contiguous 1..n; the
    assignment is deterministic across invocations."""
    a = shuffle_shard_pos(spark, sf_oracle).collect()
    b = shuffle_shard_pos(spark, sf_oracle).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r["shard_id"] < 8
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_dedup_pipeline_e2e_shape(spark, sf_oracle):
    """Survivor counts per language: positive, and never exceed the raw
    corpus counts."""
    raw = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["lang"]: r["n_docs"]
        for r in dedup_pipeline_e2e(spark, sf_oracle).collect()
    }
    assert set(got) == set(raw)
    for lang, n in got.items():
        assert 0 < n <= raw[lang]
