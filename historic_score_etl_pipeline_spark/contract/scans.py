"""Contract batch 1 — scans, filters, projections, scalar functions.

Covers SURVEY.md §2A/§2B/§2C keys.  Every Spark query is a declarative
DataFrame plan: filters/projections land on the parquet scan via Catalyst
pushdown (verified in tests/test_scale_plans.py), string/date work stays in
whole-stage codegen — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.functions.strings import (
    classify_activity,
    extract_svg_class_token,
    first_token,
    overtime_minute,
    split_clean,
)
from historic_score_etl_pipeline_spark.functions.dates import (
    parse_day_month_with_year,
    tomorrow_of,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- A1/A2: scan with projection + predicate pushdown ---------------------

def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected, filtered parquet scan.  Catalyst pushes both the filter
    and the 3-column projection into the scan (PushedFilters/ReadSchema).
    Reference analog: the landing-zone read replacing the Selenium DOM scan
    (app/team_utilities.py:20-50)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


SCAN_PARQUET_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 45
"""


# --- A3: repaired href-contains predicate ---------------------------------

def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both substrings required — the *repaired* semantics of the
    reference's buggy predicate chain (app/ref_utilities.py:152,157)."""
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").contains("spark") & F.col("text").contains("join"))
        .select("doc_id", "lang", "source")
    )


FILTER_CONTAINS_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE text LIKE '%spark%' AND text LIKE '%join%'
"""


# --- B1: projection / drop ------------------------------------------------

def project_select_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column drop (app/ref_utilities.py:203 ``drop('score')``)."""
    return load_table(spark, sf_dir, "customer").drop("c_acctbal")


PROJECT_SELECT_DROP_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
"""


# --- B2: literal column ---------------------------------------------------

def project_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant league column per partition
    (app/team_utilities.py:438-439)."""
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.lit("eredivisie").alias("league")
    )


PROJECT_LITERAL_SQL = """
SELECT n_nationkey, n_name, 'eredivisie' AS league FROM nation
"""


# --- B3: computed URL synthesis ------------------------------------------

def project_concat_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefix + id-with-marker-stripped + suffix
    (app/team_utilities.py:423-430 ``id.replace('g_1_','')``)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("https://example.org/team/"),
            F.regexp_replace(F.col("c_name"), "Customer#0*", ""),
            F.lit("/wedstrijd/"),
        ).alias("team_url"),
    )


PROJECT_CONCAT_URL_SQL = """
SELECT c_custkey,
       'https://example.org/team/' || regexp_replace(c_name, 'Customer#0*', '')
         || '/wedstrijd/' AS team_url
FROM customer
"""


# --- B4: today-OR-tomorrow incremental predicate --------------------------

def filter_date_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core incremental predicate (app/team_utilities.py:436) with
    parameterized literal dates — partition-prunable at scale."""
    d = F.col("o_orderdate").cast("date")
    return (
        load_table(spark, sf_dir, "orders")
        .where((d == F.lit("1996-06-01").cast("date")) | (d == F.lit("1996-06-02").cast("date")))
        .select(
            "o_orderkey",
            "o_custkey",
            # DATE surfaces as string so the oracle comparison is
            # representation-independent (pandas has no date dtype).
            F.date_format(d, "yyyy-MM-dd").alias("fixture_date"),
        )
    )


FILTER_DATE_OR_SQL = """
SELECT o_orderkey, o_custkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS fixture_date
FROM orders
WHERE CAST(o_orderdate AS DATE) = DATE '1996-06-01'
   OR CAST(o_orderdate AS DATE) = DATE '1996-06-02'
"""


# --- B5: non-empty-string filter ------------------------------------------

def filter_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop empty matchlinks (app/ref_utilities.py:99).  The link column is
    synthesized deterministically so both engines see identical input."""
    ev = load_table(spark, sf_dir, "events")
    matchlink = F.when(
        F.col("event_id") % 10 == 0, F.lit("")
    ).otherwise(F.concat(F.lit("match_"), F.col("event_id").cast("string")))
    return (
        ev.withColumn("matchlink", matchlink)
        .where(F.col("matchlink") != "")
        .select("event_id", "matchlink")
    )


FILTER_NONEMPTY_SQL = """
SELECT event_id, matchlink FROM (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0 THEN ''
              ELSE 'match_' || CAST(event_id AS VARCHAR) END AS matchlink
  FROM events
) WHERE matchlink <> ''
"""


# --- B6: stop-word anti-filter --------------------------------------------

def filter_isin_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN stop-word removal (app/team_utilities.py:56-57
    ``'Toon meer wedstrijden'``)."""
    return (
        load_table(spark, sf_dir, "events")
        .where(~F.col("event_type").isin("click", "view"))
        .select("event_id", "event_type")
    )


FILTER_ISIN_ANTI_SQL = """
SELECT event_id, event_type FROM events
WHERE event_type NOT IN ('click', 'view')
"""


# --- B7: arity filter (cancelled-match removal) ---------------------------

def filter_array_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep rows whose token-split has exactly 3 fields
    (app/team_utilities.py:417-420).  Raw rows synthesized with varying
    arity from event columns."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 3 == 0,
        F.concat_ws(",", F.col("event_type"), F.lit("12:00"), F.lit("done")),
    ).otherwise(F.concat_ws(",", F.col("event_type"), F.lit("cancelled")))
    return (
        ev.withColumn("raw", raw)
        .where(F.size(F.split(F.col("raw"), ",")) == 3)
        .select("event_id", "raw")
    )


FILTER_ARRAY_LEN_SQL = """
SELECT event_id, raw FROM (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0
              THEN event_type || ',12:00,done'
              ELSE event_type || ',cancelled' END AS raw
  FROM events
) WHERE len(string_split(raw, ',')) = 3
"""


# --- C1/C2: tokenizer + explode -------------------------------------------

def str_split_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-normalising tokenizer (C1).  Newlines are synthesized into
    the document text, then split_clean tokenizes; output is token count +
    first token so the result stays scalar-typed."""
    docs = load_table(spark, sf_dir, "documents")
    noisy = F.regexp_replace(F.col("text"), " ", "\n")
    toks = split_clean(noisy)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
    )


STR_SPLIT_CLEAN_SQL = """
SELECT doc_id,
       len(string_split(replace(replace(text, ' ', chr(10)), chr(10), ','), ',')) AS n_tokens,
       string_split(replace(replace(text, ' ', chr(10)), chr(10), ','), ',')[1] AS first_token
FROM documents
"""


def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten token arrays to rows (C2, itertools.chain analog) and count
    token frequency — explode + partial-agg groupBy."""
    parts = load_table(spark, sf_dir, "part")
    return (
        parts.select(F.explode(F.split(F.col("p_name"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


ARRAY_EXPLODE_SQL = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
GROUP BY token
"""


# --- C3: first-token extract ----------------------------------------------

def str_first_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything before the first separator (app/team_utilities.py:133-134)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", first_token("text", " ").alias("lead_word")
    )


STR_FIRST_TOKEN_SQL = """
-- NULL guard: DuckDB's split_part(NULL, ...) returns '' (documented
-- quirk), Spark's substring_index propagates NULL — pin NULL→NULL
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL
            ELSE split_part(text, ' ', 1) END AS lead_word
FROM documents
"""


# --- C4: stoppage-time arithmetic -----------------------------------------

def str_overtime_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'45+2' → 47 (app/team_utilities.py:135-139); minute strings
    synthesized deterministically from event ids."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(
            (F.col("event_id") % 90).cast("string"),
            F.lit("+"),
            (F.col("event_id") % 5 + 1).cast("string"),
        ),
    ).otherwise((F.col("event_id") % 90).cast("string"))
    return ev.select(
        "event_id",
        raw.alias("raw_minute"),
        overtime_minute(raw).alias("minute"),
    )


STR_OVERTIME_SUM_SQL = """
SELECT event_id, raw_minute,
       CASE WHEN contains(raw_minute, '+')
            THEN TRY_CAST(string_split(raw_minute, '+')[1] AS INTEGER)
               + TRY_CAST(string_split(raw_minute, '+')[2] AS INTEGER)
            ELSE TRY_CAST(raw_minute AS INTEGER) END AS minute
FROM (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0
              THEN CAST(event_id % 90 AS VARCHAR) || '+' || CAST(event_id % 5 + 1 AS VARCHAR)
              ELSE CAST(event_id % 90 AS VARCHAR) END AS raw_minute
  FROM events
)
"""


# --- C5: svg-token classification CASE chain ------------------------------

_SVG_BY_MOD = (
    "soccer-ball",        # goal
    "card-ico",           # red-yellowcard (dual card, no colour word)
    "red-card",           # redcard
    "yellow-card",        # yellowcard
    "substitution-in",    # substitution
    "var-check",          # var
    "warning-sign",       # penalty(missed)
)


def _svg_case_sql() -> str:
    whens = "\n".join(
        f"WHEN event_id % 7 = {i} THEN '<div><svg class=\"{tok}\"></svg></div>'"
        for i, tok in enumerate(_SVG_BY_MOD)
    )
    return f"CASE {whens} END"


def _svg_raw_col() -> F.Column:
    expr = F.when(F.col("event_id") % 7 == 0, F.lit(f'<div><svg class="{_SVG_BY_MOD[0]}"></svg></div>'))
    for i, tok in enumerate(_SVG_BY_MOD[1:], start=1):
        expr = expr.when(
            F.col("event_id") % 7 == i, F.lit(f'<div><svg class="{tok}"></svg></div>')
        )
    return expr


def str_classify_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-split + first-match-wins activity classification incl. the
    red-yellow-card disambiguation (app/team_utilities.py:146-163).
    Input svg markup synthesized per event id; the Spark side runs the
    engine's native-expression pipeline (split → filter → CASE)."""
    ev = load_table(spark, sf_dir, "events")
    raw = _svg_raw_col()
    token = extract_svg_class_token(raw)
    return ev.select(
        "event_id",
        token.alias("svg_token"),
        classify_activity(token).alias("activity"),
    )


STR_CLASSIFY_CASE_SQL = f"""
SELECT event_id, svg_token,
       CASE
         WHEN svg_token LIKE '%card%' AND svg_token NOT LIKE '%red%'
              AND svg_token NOT LIKE '%yellow%' THEN 'red-yellowcard'
         WHEN svg_token LIKE '%red%' THEN 'redcard'
         WHEN svg_token LIKE '%soccer%' THEN 'goal'
         WHEN svg_token LIKE '%substitution%' THEN 'substitution'
         WHEN svg_token LIKE '%var%' THEN 'var'
         WHEN svg_token LIKE '%warning%' THEN 'penalty(missed)'
         WHEN svg_token LIKE '%yellow%' THEN 'yellowcard'
         ELSE NULL
       END AS activity
FROM (
  SELECT event_id,
         regexp_extract({_svg_case_sql()}, '<([^<>]*svg class[^<>]*)>', 1) AS svg_token
  FROM events
)
"""


# --- C6: date parse with synthesized year ---------------------------------

def date_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrape-format date + literal year → timestamp
    (app/team_utilities.py:433).  Leap-day strings ('29.02.') fail to parse
    into 2023 and yield NULL — exercising try-parse semantics."""
    orders = load_table(spark, sf_dir, "orders")
    scraped = F.date_format(F.col("o_orderdate"), "dd.MM. HH:mm")
    return orders.select(
        "o_orderkey",
        scraped.alias("scraped_date"),
        parse_day_month_with_year(scraped, 2023).alias("parsed_ts"),
    )


DATE_PARSE_FORMAT_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%d.%m. %H:%M') AS scraped_date,
       try_strptime(strftime(o_orderdate, '%d.%m. %H:%M') || '.2023',
                    '%d.%m. %H:%M.%Y') AS parsed_ts
FROM orders
"""


# --- C7: tomorrow ---------------------------------------------------------

def date_add_tomorrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """today + 1 day horizon column (app/main.py:15-16)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("today"),
        F.date_format(tomorrow_of(F.col("o_orderdate")), "yyyy-MM-dd").alias("tomorrow"),
    )


DATE_ADD_TOMORROW_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS today,
       CAST(CAST(o_orderdate AS DATE) + 1 AS VARCHAR) AS tomorrow
FROM orders
"""


# --- C8: validating cast (cast-or-null) -----------------------------------

def safe_cast_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try/except int(item) → try_cast + NOT NULL filter
    (app/team_utilities.py:82-88)."""
    ev = load_table(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 2 == 0, (F.col("event_id") % 100).cast("string")
    ).otherwise(F.col("event_type"))
    cast = raw.try_cast("int")
    return (
        ev.select("event_id", raw.alias("raw_token"), cast.alias("token_int"))
        .where(F.col("token_int").isNotNull())
    )


SAFE_CAST_INT_SQL = """
SELECT event_id, raw_token, token_int FROM (
  SELECT event_id, raw_token, TRY_CAST(raw_token AS INTEGER) AS token_int
  FROM (
    SELECT event_id,
           CASE WHEN event_id % 2 = 0 THEN CAST(event_id % 100 AS VARCHAR)
                ELSE event_type END AS raw_token
    FROM events
  )
) WHERE token_int IS NOT NULL
"""


QUERIES: dict[str, QuerySpec] = {
    "scan_parquet": QuerySpec(scan_parquet, SCAN_PARQUET_SQL),
    "filter_contains": QuerySpec(filter_contains, FILTER_CONTAINS_SQL),
    "project_select_drop": QuerySpec(project_select_drop, PROJECT_SELECT_DROP_SQL),
    "project_literal": QuerySpec(project_literal, PROJECT_LITERAL_SQL),
    "project_concat_url": QuerySpec(project_concat_url, PROJECT_CONCAT_URL_SQL),
    "filter_date_or": QuerySpec(filter_date_or, FILTER_DATE_OR_SQL),
    "filter_nonempty": QuerySpec(filter_nonempty, FILTER_NONEMPTY_SQL),
    "filter_isin_anti": QuerySpec(filter_isin_anti, FILTER_ISIN_ANTI_SQL),
    "filter_array_len": QuerySpec(filter_array_len, FILTER_ARRAY_LEN_SQL),
    "str_split_clean": QuerySpec(str_split_clean, STR_SPLIT_CLEAN_SQL),
    "array_explode": QuerySpec(array_explode, ARRAY_EXPLODE_SQL),
    "str_first_token": QuerySpec(str_first_token, STR_FIRST_TOKEN_SQL),
    "str_overtime_sum": QuerySpec(str_overtime_sum, STR_OVERTIME_SUM_SQL),
    "str_classify_case": QuerySpec(str_classify_case, STR_CLASSIFY_CASE_SQL),
    "date_parse_format": QuerySpec(date_parse_format, DATE_PARSE_FORMAT_SQL),
    "date_add_tomorrow": QuerySpec(date_add_tomorrow, DATE_ADD_TOMORROW_SQL),
    "safe_cast_int": QuerySpec(safe_cast_int, SAFE_CAST_INT_SQL),
}
