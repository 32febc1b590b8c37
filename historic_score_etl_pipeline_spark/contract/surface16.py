"""Round-3 curation batch (batch 22): embedding quantization and
temperature-based mixture sampling — two staples of large-scale
training-data preparation beyond the reference's surface (north-star
extension per BASELINE.json; public grounding: faiss scalar
quantization, T5/mT5 temperature-weighted language mixing).

Determinism rules: explicit half-up rounding via ``floor(x + 0.5)`` in
BOTH engines (never the engine's ``round`` whose half-mode may differ),
md5-ordered ranking with the doc id as total-order tiebreak, integer or
round-6 outputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.functions.strings import null_safe_csv
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization over the embeddings table
    (operators/similarity.py::quantize_int8).  Expression-level
    transform/array_max — one projection, zero shuffles; the oracle
    recomputes every code in SQL, so quantized codes are value-exact
    across engines.

    Round-4 repair (CORRECTNESS_r03 `unhashable type: 'list'`): the
    codes array is CSV-encoded into one string column so the driver's
    pandas ``sort_values`` canonicalizer can hash the result — the
    driver contract is effectively scalar-columns-only, now enforced by
    the local gate (testing.py)."""
    from historic_score_etl_pipeline_spark.operators.similarity import (
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "embedding").select(
        "vec_id",
        "q_scale_r6",
        # null_safe_csv: a NULL embedding must stay NULL, like the
        # oracle's array_to_string(NULL) (determinism rule 7)
        null_safe_csv(
            F.transform(F.col("q_codes"), lambda x: x.cast("string"))
        ).alias("q_codes_csv"),
    )


EMBED_QUANTIZE_INT8_SQL = """
WITH scaled AS (
    SELECT vec_id,
           list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) AS scale,
           embedding
    FROM embeddings
)
SELECT vec_id,
       round(scale, 6) AS q_scale_r6,
       array_to_string(
           CASE WHEN scale > 0
                THEN list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5)
                          AS INTEGER))
                ELSE list_transform(embedding, x -> 0)
           END, ',') AS q_codes_csv
FROM scaled
"""


_ALPHA = 0.5  # temperature exponent (T5-style alpha-smoothing)
_N_TARGET = 200


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling: per-language quotas
    proportional to ``n_lang ** alpha`` (alpha=0.5 upsamples the tail the
    way multilingual-pretraining mixes do), filled deterministically by
    md5(doc_id) order — no RNG state, identical picks on any cluster or
    rerun.

    Scale shape: the per-language counts are a tiny aggregate (|langs|
    rows) broadcast back onto the corpus; selection is one hash-ordered
    window per language — rank within small quota, prunable at the
    window by quota pushdown at 100 TB (rank ≤ quota is a running
    top-K, not a full sort of the corpus when the engine applies the
    window-limit optimization)."""
    docs = load_table(spark, sf_dir, "documents")
    # Per-language weights are a |langs|-row aggregate — driver-small by
    # construction (same class as the k-means centroid collect).  Folding
    # the w_sum scalar on the driver keeps the distributed plan free of
    # the BroadcastNestedLoopJoin + SinglePartition stage a 1-row
    # crossJoin would plan (fleet red-flag budget, tests/test_scale_plans).
    weight_rows = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang", F.pow(F.col("n_docs").cast("double"), _ALPHA).alias("w")
        )
        .collect()
    )
    w_sum = sum(r["w"] for r in weight_rows)
    quota = spark.createDataFrame(
        [
            (r["lang"], max(1, int(float(_N_TARGET) * r["w"] / w_sum + 0.5)))
            for r in weight_rows
        ],
        "lang string, quota long",
    )
    from pyspark.sql import Window

    ranked = docs.select("doc_id", "lang").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


SAMPLE_TEMPERATURE_SQL = """
WITH counts AS (
    SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
weights AS (
    SELECT lang, pow(CAST(n_docs AS DOUBLE), 0.5) AS w FROM counts
),
quota AS (
    SELECT lang,
           greatest(1, CAST(floor(200.0 * w / (SELECT sum(w) FROM weights)
                             + 0.5) AS BIGINT)) AS quota
    FROM weights
),
ranked AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
    FROM documents
)
SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
FROM ranked r JOIN quota q USING (lang)
WHERE r.rk <= q.quota
"""


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: for each click, the purchase CLOSEST in time in
    either direction by the same user (ties → the prior purchase —
    pandas merge_asof direction='nearest' convention), plus which
    direction won.  One exchange, one sort, both direction carries in
    the same window pass, zero join operators
    (operators/joins.py::asof_nearest_join, plan-asserted); the oracle
    states the naive conditional join ranked by absolute distance, so
    the hash-match proves plan equivalence."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_nearest_join,
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    return asof_nearest_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="c_ts",
        right_ts="p_ts",
        payload_cols=["purchase_id"],
        right_tiebreak="purchase_id",
    ).select("click_id", "user_id", "purchase_id", "asof_dir")


JOIN_ASOF_NEAREST_SQL = """
SELECT click_id, user_id, purchase_id, asof_dir
FROM (
  SELECT c.click_id, c.user_id, p.purchase_id,
         CASE WHEN p.purchase_id IS NULL THEN NULL
              WHEN p.p_ts <= c.c_ts THEN 'backward'
              ELSE 'forward' END AS asof_dir,
         row_number() OVER (
             PARTITION BY c.click_id
             ORDER BY abs(epoch_us(p.p_ts) - epoch_us(c.c_ts)) ASC,
                      CASE WHEN p.p_ts <= c.c_ts THEN 0 ELSE 1 END ASC,
                      CASE WHEN p.p_ts <= c.c_ts THEN -p.purchase_id
                           ELSE p.purchase_id END ASC) AS rn
  FROM (SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click') c
  LEFT JOIN (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
             FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.p_user
) WHERE rn = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "embed_quantize_int8": QuerySpec(embed_quantize_int8, EMBED_QUANTIZE_INT8_SQL),
    "sample_temperature": QuerySpec(sample_temperature, SAMPLE_TEMPERATURE_SQL),
    "join_asof_nearest": QuerySpec(join_asof_nearest, JOIN_ASOF_NEAREST_SQL),
}
