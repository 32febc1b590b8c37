"""Dedup family quality gates: LSH recall vs exact Jaccard, dedup
fixpoint, fingerprint stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.dedup import (
    dedup_exact,
    jaccard,
    lsh_candidate_pairs,
    near_dup_jaccard,
    shingles,
    text_fingerprint,
)


def _docs_with_dups(spark):
    """Documents plus planted near-duplicates (suffix noise) and exact
    duplicates, so recall is measurable."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    near = base.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    exact = base.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return base.unionByName(near).unionByName(exact)


def test_exact_dedup_fixpoint(spark):
    docs = _docs_with_dups(spark)
    once = dedup_exact(docs, text_fingerprint("text"), "doc_id", ["lang"])
    n_once = once.count()
    # dedup of the dedup result changes nothing (fixpoint)
    twice = dedup_exact(
        once.withColumnRenamed("fingerprint", "fp0").withColumn(
            "text", F.lit(None).cast("string")
        ),
        F.col("fp0"),
        "doc_id",
        ["lang"],
    )
    assert twice.count() == n_once
    # planted exact dups collapse: distinct fingerprints < total rows
    assert n_once < docs.count()
    # every group kept exactly one representative
    assert once.groupBy("fingerprint").count().where("count > 1").count() == 0


def test_lsh_recall_vs_exact_jaccard(spark):
    docs = _docs_with_dups(spark)
    # ground truth: true near-dup pairs (jaccard >= 0.8 on 3-gram shingles)
    withsh = docs.select("doc_id", shingles("text").alias("sh"))
    a, b = withsh.alias("a"), withsh.alias("b")
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("j"),
        )
        .where(F.col("j") >= 0.8)
    )
    truth_pairs = {(r.id_a, r.id_b) for r in truth.collect()}
    assert truth_pairs, "planted near-dups must appear in ground truth"

    cand = lsh_candidate_pairs(docs, "doc_id", "text")
    cand_pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    recall = len(truth_pairs & cand_pairs) / len(truth_pairs)
    assert recall >= 0.9, f"LSH recall too low: {recall} over {len(truth_pairs)} pairs"


def test_near_dup_jaccard_finds_planted(spark):
    docs = _docs_with_dups(spark)
    out = near_dup_jaccard(docs, "doc_id", "text", ["lang"], threshold=0.8)
    # planted near-dups (suffix noise) have jaccard ≈ shingle overlap ≈ >0.9
    assert out.count() > 0
    assert out.where(F.col("jaccard") > 1.0).count() == 0
