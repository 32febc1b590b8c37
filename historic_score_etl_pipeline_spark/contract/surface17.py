"""Round-3 curation batch (batch 23) — corpus-statistical quality,
chunking, and exact-substring dedup: three more training-data staples
beyond the reference's surface (north-star extensions; public grounding:
CCNet perplexity filtering (Wenzek et al. 2020), RAG/context chunking,
and exact-substring dedup (Lee et al. 2022)).

Determinism rules for these oracles: the only float ever computed
(``ln`` in the surprisal score) is immediately fixed-pointed to integer
micro-nats with explicit half-up ``floor(x + 0.5)``, so every output
column is an exact integer or exact string — no float-sum ordering
drift, no HUGEINT leakage (every aggregate is CAST to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM; per-doc surprisal as an
    order-independent integer micro-nat sum (operators/text.py::
    bigram_surprisal).  The CCNet-style quality signal."""
    from historic_score_etl_pipeline_spark.operators.text import bigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return bigram_surprisal(docs, "doc_id", "text")


TEXT_BIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
v AS (
  SELECT count(DISTINCT x) AS vsize
  FROM (SELECT unnest(t) AS x FROM toks)
),
scored AS (
  SELECT p.doc_id,
         CAST(floor(-ln((c2.c2 + 1.0) / (CAST(c1.c1 AS DOUBLE) + v.vsize))
                    * 1000000.0 + 0.5) AS BIGINT) AS surp
  FROM pairs p
  JOIN c2 USING (w1, w2)
  JOIN c1 USING (w1)
  CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(surp) AS BIGINT) AS surprisal_unats
FROM scored
GROUP BY doc_id
"""


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks, stride 24 (operators/text.py::
    chunk_windows) — the RAG / packing primitive.  Integer/string
    output only."""
    from historic_score_etl_pipeline_spark.operators.text import chunk_windows

    docs = load_table(spark, sf_dir, "documents")
    return chunk_windows(docs, "doc_id", "text", size=32, stride=24)


TEXT_CHUNK_WINDOWS_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, CAST(u.i AS BIGINT) AS start,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY u.i) - 1
              AS INTEGER) AS chunk_idx
  FROM toks, unnest(range(0, len(t), 24)) AS u(i)
  WHERE len(t) > 0
)
SELECT doc_id, chunk_idx, start,
       CAST(len(t[start + 1 : start + 32]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[start + 1 : start + 32], ' ') AS chunk_text
FROM starts
"""


def dedup_substring_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing a verbatim 8-token gram with earliest span
    offsets (operators/dedup.py::substring_span_pairs) — fixed-gram
    exact-substring dedup, gram-bucket join, max_df=20 skew guard."""
    from historic_score_etl_pipeline_spark.operators.dedup import (
        substring_span_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return substring_span_pairs(docs, "doc_id", "text", n=8, max_df=20)


DEDUP_SUBSTRING_SPAN_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS start,
         array_to_string(t[u.i : u.i + 7], ' ') AS gram
  FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
occ AS (
  SELECT doc_id, gram, min(start) AS start FROM grams GROUP BY doc_id, gram
),
freq AS (
  SELECT gram, count(*) AS gram_df FROM occ GROUP BY gram
),
occf AS (
  SELECT o.doc_id, o.gram, o.start
  FROM occ o JOIN freq f ON o.gram = f.gram
  WHERE f.gram_df BETWEEN 2 AND 20
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_grams,
       CAST(min(a.start) AS BIGINT) AS first_start_a,
       CAST(min(b.start) AS BIGINT) AS first_start_b
FROM occf a JOIN occf b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup over the embeddings table (operators/similarity.py::
    semantic_dedup): k-means clusters, then within-cluster cosine
    pruning with the keep-lowest-id convention.  rows-only: the k-means
    step is an iterative float fixpoint (no SQL twin); the survivor-set
    invariants are pytest-asserted instead
    (tests/test_surface17.py::test_semantic_dedup_invariants)."""
    from historic_score_etl_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", k=16, iters=2, threshold=0.35
    )


QUERIES: dict[str, QuerySpec] = {
    "text_bigram_surprisal": QuerySpec(
        text_bigram_surprisal, TEXT_BIGRAM_SURPRISAL_SQL
    ),
    "text_chunk_windows": QuerySpec(text_chunk_windows, TEXT_CHUNK_WINDOWS_SQL),
    "dedup_substring_span": QuerySpec(
        dedup_substring_span, DEDUP_SUBSTRING_SPAN_SQL
    ),
    "dedup_semantic": QuerySpec(dedup_semantic, None),
}
