"""Round-3 batch 27 — two operators Spark lacks natively, restated as
compositions (the SURVEY §4.2 custom-operator rule):

* running COUNT(DISTINCT) over a window — unsupported in Spark SQL
  (and a full per-row set would be O(group²) state); restated as
  first-occurrence flags + a running sum, one shuffle + two sorted
  passes over the same partitioning;
* weighted sampling without replacement — priority sampling
  (Duffield-Lund-Thorup, q = u/w) with a seeded md5 uniform in place of
  the random key, so the k-sample is deterministic across
  engines/retries while honoring the weights.

Determinism: the priority key uses ONLY correctly-rounded IEEE ops
(+, /, ×, floor) — no libm calls (Spark's JVM ln diverges from glibc by
1 ulp on ~1% of inputs, measured in review) — and is fixed-pointed
BEFORE ranking, ties break on doc_id; everything else is
integer/string; aggregates CAST to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- running distinct count over a window ---------------------------------------


def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, the number of DISTINCT event types seen up to and
    including each event.  Spark has no COUNT(DISTINCT) OVER — and a
    naive collect_set-over-window carries a per-row set.  The scalable
    restatement: mark each (user, type)'s FIRST occurrence (lag over the
    type-major sort), then running-sum the 0/1 flags in event-time order.
    Both windows partition on user_id only, so the plan is ONE hash
    shuffle + two sorted passes — per-row state is one long, never a
    set."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    w_type = Window.partitionBy("user_id").orderBy(
        "event_type", "ts_us", "event_id"
    )
    # null-SAFE inequality (~eqNullSafe) to mirror the oracle's
    # IS DISTINCT FROM: with lag != col, a NULL event_type would yield a
    # NULL flag (summed as 0) on Spark but count as one distinct type in
    # DuckDB — silent divergence if the schema ever admits nulls
    # (ADVICE r3).
    first_flag = (
        ~F.lag("event_type").over(w_type).eqNullSafe(F.col("event_type"))
    ).cast("long")
    w_time = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("f", first_flag)
        .select(
            "event_id",
            "user_id",
            F.sum("f").over(w_time).cast("long").alias("n_distinct_types"),
        )
    )


WINDOW_DISTINCT_COUNT_SQL = """
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT event_id, user_id, ts_us,
         CASE WHEN lag(event_type) OVER
                (PARTITION BY user_id ORDER BY event_type, ts_us, event_id)
              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS f
  FROM base
)
SELECT event_id, user_id,
       CAST(sum(f) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct_types
FROM flagged
"""


# --- deterministic weighted sampling (priority sampling) -------------------------

_ES_K = 10
_ES_SEED = "es42:"


def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional k-sample per language WITHOUT replacement and
    WITHOUT RNG state: priority sampling (Duffield-Lund-Thorup) — the k
    rows with the smallest q = u / w per group, u a seeded md5 uniform,
    weight w = n_chars.  Heavier docs draw proportionally smaller
    priorities, yet the sample is identical on every engine, retry, and
    partitioning.  Deliberately NOT the Efraimidis-Spirakis -ln(u)/w
    key: ln is a libm call, and Spark's (JVM) log diverges from
    DuckDB's (glibc) by 1 ulp on ~1% of these inputs (measured) —
    division and multiplication are correctly-rounded IEEE ops,
    bit-identical everywhere, so the fixpointed key has NO cross-engine
    float surface.  Ties → doc_id.  One shuffle on lang; the rank
    compiles to WindowGroupLimit top-k, so per-group state is k rows.
    Zero/NULL-weight docs are excluded on BOTH engines — a weight of 0
    has no meaningful priority (Spark's ANSI division would raise)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars") > 0
    )
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(_ES_SEED), F.col("doc_id").cast("string"))),
        1, 8,
    ), 16, 10).cast("long")
    key = F.floor(
        (h.cast("double") + F.lit(1.0))
        / F.col("n_chars").cast("double")
        * F.lit(1e9)
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        docs.select(
            "doc_id", "lang",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("priority"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _ES_K)
        .select("doc_id", "lang", "weight", "priority",
                F.col("rk").cast("long").alias("rk"))
    )


SAMPLE_WEIGHTED_HASH_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         CAST(floor((CAST(CAST(('0x' || substr(
                  md5('{_ES_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS DOUBLE) + 1.0)
               / CAST(n_chars AS DOUBLE) * 1000000000.0) AS BIGINT)
           AS priority
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, weight, priority,
         row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id)
           AS rk
  FROM keyed
)
SELECT doc_id, lang, weight, priority, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_ES_K}
"""


# --- grid-bucketed spatial neighbor join -----------------------------------------

_SP_DIST = 0.02


def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs within Euclidean distance 0.02 in the first
    two dimensions (operators/joins.py::spatial_neighbor_join) — the 2-D
    member of the bin-bucket family: probe side replicated into its 3×3
    cell neighborhood, build side in its home cell only, plain equi-join
    on (cell_x, cell_y); an unordered pair meets exactly twice and
    ``id_a < id_b`` keeps one — emit-once, no dedup.  Oracle is the
    naive theta self-join with the identical squared-distance fixpoint."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        spatial_neighbor_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    return spatial_neighbor_join(pts, "vec_id", "x", "y", _SP_DIST)


JOIN_SPATIAL_GRID_SQL = f"""
WITH p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                  * 1000000000000.0 + 0.5) AS BIGINT) AS dist_sq_e12
FROM p a JOIN p b ON a.vec_id < b.vec_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_SP_DIST} * {_SP_DIST}
"""


QUERIES: dict[str, QuerySpec] = {
    "window_distinct_count": QuerySpec(
        window_distinct_count, WINDOW_DISTINCT_COUNT_SQL
    ),
    "join_spatial_grid": QuerySpec(join_spatial_grid, JOIN_SPATIAL_GRID_SQL),
    "sample_weighted_hash": QuerySpec(
        sample_weighted_hash, SAMPLE_WEIGHTED_HASH_SQL
    ),
}
