"""Round-6 batch 42 — string-codec and SQL-semantics staples:

* ``str_base64_roundtrip`` — base64 encode/decode roundtrip of a short
  composed record (RFC 4648, no line chunking — inputs are kept < 57
  bytes so the legacy-chunking divergence class can't arise).
* ``str_initcap_title`` — Spark ``initcap`` vs an explicit per-token
  ucfirst/lower replay in the oracle; tokens are pre-normalized to a
  single-space join so the two engines agree on word boundaries by
  construction.
* ``str_translate_sub`` — character-map ``translate`` in both its
  substitution form (vowels → digits) and its deletion form (shorter
  ``to`` string), plus the length delta as the vowel count.
* ``str_pad_fixed_width`` — render a fixed-width record with
  rpad/lpad, then parse it back by byte offsets and verify the
  roundtrip recovers the original integers (mainframe-style layout,
  the positional-parsing shape of the reference's
  app/team_utilities.py:76-88 record splitter).
* ``sql_not_in_null_semantics`` — three-valued-logic surface: a NOT IN
  whose subquery contains a NULL is empty (UNKNOWN), while the
  NOT EXISTS spelling counts real non-matches and IN still matches —
  one row with all three counts; the hash match is the proof both
  engines implement the standard's NULL semantics identically.

Scale notes: all four string queries are pure scan-side projections
(zero shuffles beyond the final display sort — no shuffle at all, the
aggregate ones are map-side combinable); the NOT IN compiles to a
null-aware anti join broadcasting a DISTINCT dim-sized key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.functions.strings import null_safe_csv
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- base64 roundtrip -----------------------------------------------------------


def str_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode a short composed record to base64, decode it back, and
    surface the roundtrip equality — the opaque-payload encode path
    (binary columns travel as base64 through JSON sinks)."""
    orders = load_table(spark, sf_dir, "orders")
    rec = F.concat_ws("|", F.col("o_orderkey"), F.col("o_orderpriority"))
    b64 = F.base64(F.encode(rec, "UTF-8"))
    back = F.decode(F.unbase64(b64), "UTF-8")
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        b64.alias("b64"),
        F.length(b64).cast("long").alias("b64_len"),
        (back == rec).alias("roundtrip_ok"),
    )


STR_BASE64_ROUNDTRIP_SQL = """
WITH r AS (
  SELECT o_orderkey,
         CAST(o_orderkey AS VARCHAR) || '|' || o_orderpriority AS rec
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       to_base64(encode(rec)) AS b64,
       CAST(length(to_base64(encode(rec))) AS BIGINT) AS b64_len,
       decode(from_base64(to_base64(encode(rec)))) = rec AS roundtrip_ok
FROM r
"""


# --- initcap title case ---------------------------------------------------------


def str_initcap_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title-case the first 6 tokens of each document with ``initcap``.
    The input is re-joined on single spaces first, so Spark's
    whitespace-delimited word rule and the oracle's explicit per-token
    ucfirst agree by construction."""
    docs = load_table(spark, sf_dir, "documents")
    # null_safe_csv pins NULL text → NULL title (determinism rule 7):
    # bare concat_ws would render the NULL token array as '' while the
    # oracle's array_to_string(NULL) stays NULL
    head6 = null_safe_csv(
        F.slice(F.split(F.trim("text"), r"\s+"), 1, 6), " "
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.initcap(head6).alias("title"),
        F.length(F.initcap(head6)).cast("long").alias("title_len"),
    )


STR_INITCAP_TITLE_SQL = """
WITH t AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             string_split_regex(trim(text), '\\s+')[1:6],
             w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))),
           ' ') AS title
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       title,
       CAST(length(title) AS BIGINT) AS title_len
FROM t
"""


# --- translate substitution / deletion ------------------------------------------


def str_translate_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-map translate over part names: vowels → digits
    (substitution) and vowels → nothing (deletion; the length delta is
    the vowel count) — both forms of the classic charmap operator."""
    part = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.translate(name, "aeiou", "01234").alias("subbed"),
        (F.length(name) - F.length(F.translate(name, "aeiou", "")))
        .cast("long")
        .alias("n_vowels"),
    )


STR_TRANSLATE_SUB_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       translate(p_name, 'aeiou', '01234') AS subbed,
       CAST(length(p_name) - length(translate(p_name, 'aeiou', ''))
            AS BIGINT) AS n_vowels
FROM part
"""


# --- fixed-width render + positional parse-back ---------------------------------

_FW_NAME, _FW_SIZE, _FW_CENTS = 30, 4, 12


def str_pad_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each part as a fixed-width record (rpad name 30, lpad
    size 4, lpad retail cents 12), then parse the integers back by
    byte offsets and flag roundtrip equality — the positional-record
    layout of the reference's splitter (app/team_utilities.py:76-88),
    here with the offsets arithmetically verifiable."""
    part = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    rec = F.concat(
        F.rpad(F.col("p_name"), _FW_NAME, " "),
        F.lpad(F.col("p_size").cast("string"), _FW_SIZE, "0"),
        F.lpad(cents.cast("string"), _FW_CENTS, "0"),
    )
    parsed_size = F.substring(rec, _FW_NAME + 1, _FW_SIZE).cast("long")
    parsed_cents = F.substring(
        rec, _FW_NAME + _FW_SIZE + 1, _FW_CENTS
    ).cast("long")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        rec.alias("record"),
        parsed_size.alias("parsed_size"),
        parsed_cents.alias("parsed_cents"),
        (
            (parsed_size == F.col("p_size").cast("long"))
            & (parsed_cents == cents)
        ).alias("roundtrip_ok"),
    )


STR_PAD_FIXED_WIDTH_SQL = f"""
WITH r AS (
  SELECT p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
         rpad(p_name, {_FW_NAME}, ' ')
           || lpad(CAST(p_size AS VARCHAR), {_FW_SIZE}, '0')
           || lpad(CAST(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                        AS VARCHAR), {_FW_CENTS}, '0') AS record
  FROM part
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
       record,
       CAST(substr(record, {_FW_NAME + 1}, {_FW_SIZE}) AS BIGINT)
         AS parsed_size,
       CAST(substr(record, {_FW_NAME + _FW_SIZE + 1}, {_FW_CENTS}) AS BIGINT)
         AS parsed_cents,
       CAST(substr(record, {_FW_NAME + 1}, {_FW_SIZE}) AS BIGINT)
           = CAST(p_size AS BIGINT)
         AND CAST(substr(record, {_FW_NAME + _FW_SIZE + 1}, {_FW_CENTS})
                  AS BIGINT) = cents AS roundtrip_ok
FROM r
"""


# --- NOT IN vs NOT EXISTS under NULL --------------------------------------------


def sql_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic in one row: a NOT IN whose value list contains
    a NULL can never be TRUE (every non-match is UNKNOWN), while
    NOT EXISTS counts real non-matches and IN is unaffected by the
    NULL.  Runs as literal SQL through Catalyst's null-aware anti-join
    planning; the oracle runs the identical statement in DuckDB."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(_SQL_NOT_IN_BODY.format(c="v_customer", o="v_orders"))


_SQL_NOT_IN_BODY = """
SELECT
  CAST((SELECT count(*) FROM {c}
        WHERE c_custkey NOT IN
          (SELECT CASE WHEN o_orderpriority LIKE '1%' THEN o_custkey END
           FROM {o})) AS BIGINT) AS n_not_in,
  CAST((SELECT count(*) FROM {c} cu
        WHERE NOT EXISTS
          (SELECT 1 FROM {o} o WHERE o.o_custkey = cu.c_custkey
           AND o.o_orderpriority LIKE '1%')) AS BIGINT) AS n_not_exists,
  CAST((SELECT count(*) FROM {c}
        WHERE c_custkey IN
          (SELECT CASE WHEN o_orderpriority LIKE '1%' THEN o_custkey END
           FROM {o})) AS BIGINT) AS n_in,
  CAST((SELECT count(*) FROM {c}) AS BIGINT) AS n_total
"""

SQL_NOT_IN_NULL_SEMANTICS_SQL = _SQL_NOT_IN_BODY.format(
    c="customer", o="orders"
)


QUERIES: dict[str, QuerySpec] = {
    "str_base64_roundtrip": QuerySpec(
        str_base64_roundtrip, STR_BASE64_ROUNDTRIP_SQL
    ),
    "str_initcap_title": QuerySpec(str_initcap_title, STR_INITCAP_TITLE_SQL),
    "str_translate_sub": QuerySpec(str_translate_sub, STR_TRANSLATE_SUB_SQL),
    "str_pad_fixed_width": QuerySpec(
        str_pad_fixed_width, STR_PAD_FIXED_WIDTH_SQL
    ),
    "sql_not_in_null_semantics": QuerySpec(
        sql_not_in_null_semantics, SQL_NOT_IN_NULL_SEMANTICS_SQL
    ),
}
