"""Round-4 batch 33 — SQL-function surface completion (lean batch):

* ``agg_bool_every_any`` — ``every`` / ``any`` boolean aggregates
  (bool_and / bool_or): per-user data-quality style predicates (all
  events priced? any error seen?), the assertion-style aggregate a
  validation pipeline runs per partition of a 100 TB table.
* ``hof_exists_forall`` — the EXISTS / FORALL higher-order predicates
  over token arrays (complements the transform/filter/aggregate
  pipeline in ``hof_array_pipeline``): short-circuit array tests that
  stay in codegen — no explode, no shuffle, scan-side only.
* ``hof_arrays_zip`` — ``arrays_zip`` + inline-style explode of two
  PARALLEL arrays (tokens and their lengths): the positional pairing
  that keeps columnar arrays aligned without a positional join.

All three are expression-surface queries: zero or one shuffle, scan
pushdown untouched; DuckDB twins restate the HOFs with list_filter /
len arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- every / any boolean aggregates -------------------------------------------


def agg_bool_every_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user boolean assertions: did EVERY event carry a positive
    value, did ANY error occur, did ANY big-ticket event (>90) occur —
    one map-side-combined shuffle; booleans surface as BIGINT 0/1 so
    the driver hash sees identical dtypes in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.every(F.col("value") > 0).cast("long").alias("all_positive"),
        F.bool_or(F.col("event_type") == "error").cast("long").alias("any_error"),
        F.bool_or(F.col("value") > 90).cast("long").alias("any_big"),
    )


AGG_BOOL_EVERY_ANY_SQL = """
SELECT user_id,
       CAST(CASE WHEN bool_and(value > 0) THEN 1 ELSE 0 END AS BIGINT)
         AS all_positive,
       CAST(CASE WHEN bool_or(event_type = 'error') THEN 1 ELSE 0 END
            AS BIGINT) AS any_error,
       CAST(CASE WHEN bool_or(value > 90) THEN 1 ELSE 0 END AS BIGINT)
         AS any_big
FROM events GROUP BY user_id
"""


# --- EXISTS / FORALL over arrays ----------------------------------------------


def hof_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array predicates without exploding: does any token exceed 6
    chars, are all tokens under 12, does any token equal 'data' —
    pure scan-side expressions (short-circuiting in codegen), then one
    tiny rollup per language."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    has_long = F.exists(toks, lambda t: F.length(t) > 6)
    all_short = F.forall(toks, lambda t: F.length(t) < 12)
    has_data = F.exists(toks, lambda t: t == "data")
    return (
        docs.select(
            "lang",
            has_long.cast("long").alias("has_long"),
            all_short.cast("long").alias("all_short"),
            has_data.cast("long").alias("has_data"),
        )
        .groupBy("lang")
        .agg(
            F.sum("has_long").cast("long").alias("n_has_long"),
            F.sum("all_short").cast("long").alias("n_all_short"),
            F.sum("has_data").cast("long").alias("n_has_data"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )


HOF_EXISTS_FORALL_SQL = """
WITH toks AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), flags AS (
  SELECT lang,
         CASE WHEN len(list_filter(t, x -> length(x) > 6)) > 0
              THEN 1 ELSE 0 END AS has_long,
         CASE WHEN len(list_filter(t, x -> length(x) >= 12)) = 0
              THEN 1 ELSE 0 END AS all_short,
         CASE WHEN len(list_filter(t, x -> x = 'data')) > 0
              THEN 1 ELSE 0 END AS has_data
  FROM toks
)
SELECT lang,
       CAST(sum(has_long) AS BIGINT) AS n_has_long,
       CAST(sum(all_short) AS BIGINT) AS n_all_short,
       CAST(sum(has_data) AS BIGINT) AS n_has_data,
       CAST(count(*) AS BIGINT) AS n_docs
FROM flags GROUP BY lang
"""


# --- arrays_zip positional pairing --------------------------------------------

_ZIP_PREFIX = 10


def hof_arrays_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two PARALLEL arrays (first-10 tokens and their lengths) paired
    positionally with ``arrays_zip`` and exploded once — the aligned-
    columns idiom that replaces a positional self-join.  Output: per
    position, how many docs have a token there and the total length
    mass — an alignment histogram."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.slice(
        F.filter(F.split(F.col("text"), " "), lambda x: x != ""),
        1,
        _ZIP_PREFIX,
    )
    lens = F.transform(toks, lambda t: F.length(t))
    zipped = F.arrays_zip(toks.alias("tok"), lens.alias("len"))
    return (
        docs.select(F.posexplode(zipped).alias("pos", "z"))
        .select("pos", F.col("z.tok").alias("tok"), F.col("z.len").alias("tlen"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tlen").cast("long").alias("len_mass"),
            F.min("tok").alias("first_tok"),
        )
        .select(F.col("pos").cast("long").alias("pos"), "n_docs", "len_mass",
                "first_tok")
    )


HOF_ARRAYS_ZIP_SQL = f"""
WITH toks AS (
  SELECT list_slice(list_filter(string_split(text, ' '), x -> x <> ''),
                    1, {_ZIP_PREFIX}) AS t
  FROM documents
), positioned AS (
  SELECT g.i - 1 AS pos, t[g.i] AS tok, length(t[g.i]) AS tlen
  FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
)
SELECT CAST(pos AS BIGINT) AS pos,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tlen) AS BIGINT) AS len_mass,
       min(tok) AS first_tok
FROM positioned GROUP BY pos
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_bool_every_any": QuerySpec(agg_bool_every_any, AGG_BOOL_EVERY_ANY_SQL),
    "hof_exists_forall": QuerySpec(hof_exists_forall, HOF_EXISTS_FORALL_SQL),
    "hof_arrays_zip": QuerySpec(hof_arrays_zip, HOF_ARRAYS_ZIP_SQL),
}
