"""Round-3 curation batch (batch 24) — eval-set decontamination at the
published-standard granularity, token-budget mixture sampling,
deterministic reservoir sampling, and within-doc entropy scoring.
Four more training-data staples beyond the reference's surface
(north-star extensions; public grounding: GPT-3 13-gram benchmark
decontamination (Brown et al. 2020, appendix C), domain-mixture data
recipes (Gao et al. 2021, The Pile; Touvron et al. 2023), and Gopher
quality heuristics (Rae et al. 2021 §A1.1)).

Determinism rules (same contract as surface17): the only float ever
computed (``ln`` in the entropy terms) is fixed-pointed to integer
micro-nats per TERM with half-up ``floor(x + 0.5)`` BEFORE any sum, so
every output column is an exact integer or exact string; all sampling
is ``md5``-keyed (no RNG state, reproducible across engines and
retries); every aggregate is CAST to BIGINT (no HUGEINT leakage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- 13-gram eval-set decontamination ------------------------------------------

_NGRAM = 13
_EVAL_SOURCE = "src0"  # the held-out "benchmark" split of the synthetic corpus


def dedup_decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style stride-1 13-gram decontamination (operators/dedup.py::
    ngram_decontaminate): training docs (source ≠ src0) flagged when any
    sliding 13-token gram appears verbatim in the eval split (source =
    src0).  Complements ``dedup_contamination`` (32-char stride-16 chunk
    hashing, contract/surface14.py) with the exact published standard."""
    from historic_score_etl_pipeline_spark.operators.dedup import (
        ngram_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("source") != _EVAL_SOURCE)
    eval_df = docs.where(F.col("source") == _EVAL_SOURCE)
    return ngram_decontaminate(train, eval_df, "doc_id", "text", n=_NGRAM)


DEDUP_DECONTAMINATE_13GRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(t[u.i : u.i + {_NGRAM - 1}], ' ') AS gram
  FROM toks, unnest(range(1, len(t) - {_NGRAM} + 2)) AS u(i)
  WHERE len(t) >= {_NGRAM}
),
ev AS (SELECT DISTINCT gram FROM grams WHERE source = '{_EVAL_SOURCE}'),
tr AS (SELECT doc_id, gram FROM grams WHERE source <> '{_EVAL_SOURCE}')
SELECT tr.doc_id AS train_id,
       CAST(count(*) AS BIGINT) AS n_hit_grams,
       min(tr.gram) AS first_hit_gram
FROM tr JOIN ev USING (gram)
GROUP BY tr.doc_id
"""


# --- token-budget mixture sampling ---------------------------------------------

# Per-source token budgets (the "data recipe": upweight src1, downweight
# src2, flat elsewhere).  Each synthetic source holds ~1.3-1.5k tokens,
# so these budgets exercise both the keep-all and the cut paths.
_MIX_BUDGETS = {"src1": 1000, "src2": 400}
_MIX_DEFAULT = 700
_MIX_SEED = "mix42:"


def sample_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixture: within each source, docs are ordered
    by a seeded ``md5`` priority and kept while the EXCLUSIVE running
    token total is under the source's budget (greedy fill — the last
    kept doc may overflow, the standard recipe convention).  This is how
    published data recipes (The Pile, LLaMA) realize per-domain epochs/
    weights as concrete document sets.

    Scale shape: one hash shuffle on ``source``; the window state is one
    running long per partition.  No RNG state — the md5 priority makes
    the sample reproducible across engines, runs, and retries, and at
    100 TB a skewed giant domain salts into (source, md5-prefix)
    sub-partitions with per-prefix budget shares."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    pri = F.md5(F.concat(F.lit(_MIX_SEED), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("source")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = (
        F.when(F.col("source") == "src1", F.lit(_MIX_BUDGETS["src1"]))
        .when(F.col("source") == "src2", F.lit(_MIX_BUDGETS["src2"]))
        .otherwise(F.lit(_MIX_DEFAULT))
    )
    return (
        docs.select(
            "doc_id", "source", n_tokens.alias("n_tokens"), pri.alias("pri")
        )
        .withColumn(
            "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .where(F.col("cum_before") < budget)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cum_before").cast("long").alias("cum_before"),
        )
    )


SAMPLE_MIXTURE_BUDGET_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         md5('{_MIX_SEED}' || CAST(doc_id AS VARCHAR)) AS pri
  FROM documents
),
ordered AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM toks
)
SELECT doc_id, source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_before AS BIGINT) AS cum_before
FROM ordered
WHERE cum_before < CASE source WHEN 'src1' THEN {_MIX_BUDGETS["src1"]}
                               WHEN 'src2' THEN {_MIX_BUDGETS["src2"]}
                               ELSE {_MIX_DEFAULT} END
"""


# --- deterministic reservoir sampling ------------------------------------------

_RESERVOIR_K = 7
_RESERVOIR_SEED = "res42:"


def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample per group WITHOUT RNG state: the k rows
    with the smallest seeded ``md5`` priority per ``event_type`` — the
    distributed, re-runnable equivalent of reservoir sampling (priority
    sampling with a hash in place of the random key; uniform because md5
    is uniform over ids).

    Scale shape: one hash shuffle on the group key, then a bounded
    top-k; state is k rows per group, never the group.  Unlike
    ``TABLESAMPLE``/``rand()`` the sample is stable across retries,
    partitionings, and engines — the property that makes it usable in a
    correctness-gated pipeline."""
    ev = load_table(spark, sf_dir, "events")
    pri = F.md5(F.concat(F.lit(_RESERVOIR_SEED), F.col("event_id").cast("string")))
    w = Window.partitionBy("event_type").orderBy("pri", "event_id")
    return (
        ev.select("event_id", "event_type", pri.alias("pri"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _RESERVOIR_K)
        .select("event_id", "event_type", F.col("rk").cast("long").alias("rk"))
    )


SAMPLE_RESERVOIR_HASH_SQL = f"""
WITH pri AS (
  SELECT event_id, event_type,
         md5('{_RESERVOIR_SEED}' || CAST(event_id AS VARCHAR)) AS p
  FROM events
),
ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY p, event_id) AS rk
  FROM pri
)
SELECT event_id, event_type, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_RESERVOIR_K}
"""


# --- within-doc token entropy --------------------------------------------------


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each doc's token distribution in integer
    micro-nats (operators/text.py::token_entropy) — the gibberish /
    degenerate-repetition filter signal; every ln term is fixed-pointed
    before summation so the summation ORDER has no float surface.

    Residual cross-engine risk (same class as ``text_bigram_surprisal``,
    surface20.py:105): the per-term fixpoint floor((c/n)·ln(n/c)·1e6+0.5)
    still calls each engine's libm ``ln``, and JVM StrictMath vs glibc
    differ by 1 ulp on ~1% of inputs (measured in review) — a term whose
    scaled value lands within ~1e-10 of a .5 boundary can round to a
    different unat and break the hash.  Never observed at sf0.01/0.1
    (the driver's scales); increasingly likely over millions of distinct
    (c, n) pairs.  A correctly-rounded integer-only formulation would
    need a fixed-point ln — out of scope while the observed failure rate
    is zero (ADVICE r3, acknowledged)."""
    from historic_score_etl_pipeline_spark.operators.text import token_entropy

    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text")


TEXT_TOKEN_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
counts AS (
  SELECT doc_id, x AS tok, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS x FROM toks WHERE len(t) > 0)
  GROUP BY doc_id, x
),
withn AS (
  SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM counts
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c)
                           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS entropy_unats
FROM withn
GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_decontaminate_13gram": QuerySpec(
        dedup_decontaminate_13gram, DEDUP_DECONTAMINATE_13GRAM_SQL
    ),
    "sample_mixture_budget": QuerySpec(
        sample_mixture_budget, SAMPLE_MIXTURE_BUDGET_SQL
    ),
    "sample_reservoir_hash": QuerySpec(
        sample_reservoir_hash, SAMPLE_RESERVOIR_HASH_SQL
    ),
    "text_token_entropy": QuerySpec(text_token_entropy, TEXT_TOKEN_ENTROPY_SQL),
}
