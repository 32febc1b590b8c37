"""Round-6 batch 59 — writer-side CSV quoting, balanced sampling,
path mining, ISO-week calendars, and relational division (overflow
slots):

* ``sink_csv_quoting_roundtrip`` — the WRITER-side quoting proof:
  strings with embedded delimiters, RFC-doubled quotes and newlines
  staged to CSV and read back multiLine — the per-status md5
  fingerprint must survive the trip bit-for-bit (the oracle computes
  it from the original rows; any quoting loss breaks the hash).
* ``sample_stratified_topn`` — EXACT-N balanced sampling: the first
  100 rows per event_type in deterministic md5 order (the
  class-balanced cousin of proportional ``sample_stratified_hash``).
* ``event_sequence_trigrams`` — 3-step path mining: per-user ordered
  event-type trigrams via two leads over one window, top 10
  (count desc, path asc).
* ``date_iso_week_boundary`` — ISO week-date calendar law at year
  boundaries: ISO year ≠ calendar year for early-January/late-
  December dates, week-53 handling — grouped order counts per
  (iso_year, iso_week).
* ``sql_relational_division`` — the division shape: users whose
  distinct event types cover ALL observed types (÷ via count-distinct
  = 1-row broadcast total, the scalar-folding rule).

Scale notes: the CSV sink writes partitioned files then aggregates
the read-back (no driver materialization); stratified top-N windows
partition by type; trigrams ride the per-user window already ordered
for lag/lead; ISO-week grouping is scan-side arithmetic; division
pre-shrinks to DISTINCT (user, type) before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- CSV quoting round-trip --------------------------------------------------------


def _note_col():
    """A deliberately hostile CSV payload: delimiter, RFC quotes, and
    an embedded newline, all derived from fixture columns."""
    return F.concat(
        F.lit('p:"'),
        F.col("o_orderpriority"),
        F.lit('",'),
        F.col("o_orderstatus"),
        F.lit("\nk="),
        F.col("o_orderkey").cast("string"),
    )


def sink_csv_quoting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write hostile strings to CSV (RFC quote-doubling), read back
    multiLine, fingerprint per status — lossless or the hash breaks."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "csvquote", sf_dir)
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_orderstatus").alias("status"),
        _note_col().alias("note"),
    )
    (
        base.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')  # RFC 4180 doubling, not backslash
        .csv(out)
    )
    back = (
        spark.read.schema("o_orderkey long, status string, note string")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(out)
    )
    h = F.conv(F.substring(F.md5("note"), 1, 15), 16, 10).cast("long")
    return back.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("note")).cast("long").alias("sum_len"),
        F.bit_xor(h).cast("long").alias("xor_sig"),
    )


SINK_CSV_QUOTING_ROUNDTRIP_SQL = """
WITH built AS (
  SELECT o_orderstatus AS status,
         'p:"' || o_orderpriority || '",' || o_orderstatus
         || chr(10) || 'k=' || CAST(o_orderkey AS VARCHAR) AS note
  FROM orders
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(note)) AS BIGINT) AS sum_len,
       CAST(bit_xor(CAST(('0x' || substr(md5(note), 1, 15)) AS BIGINT))
            AS BIGINT) AS xor_sig
FROM built GROUP BY status
"""


# --- exact-N stratified sampling ---------------------------------------------------

_STRAT_N = 100


def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 100 events per type in md5(event_id) order — the exact-N
    class-balanced sample, fully deterministic and retry-stable."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    key = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= _STRAT_N)
        .select("event_id", "event_type", F.col("rn").cast("long").alias("rn"))
    )


SAMPLE_STRATIFIED_TOPN_SQL = f"""
WITH ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)),
                                     event_id) AS rn
  FROM events WHERE event_type IS NOT NULL
)
SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
       CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_STRAT_N}
"""


# --- 3-step path mining ------------------------------------------------------------

_TRI_TOPK = 10


def event_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 per-user event-type trigrams (two leads over one ordered
    window) — 3-step path mining."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(_TRI_TOPK)
    )


EVENT_SEQUENCE_TRIGRAMS_SQL = f"""
WITH seq AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t3
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT t1 || '>' || t2 || '>' || t3 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT {_TRI_TOPK}
"""


# --- ISO week-date boundaries ------------------------------------------------------


def date_iso_week_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per ISO (year, week): the ISO year detaches from
    the calendar year at boundaries and week 53 exists."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.select(
            F.expr("extract(YEAROFWEEK FROM to_date(o_orderdate))")
            .cast("long")
            .alias("iso_year"),
            F.weekofyear(d).cast("long").alias("iso_week"),
            d.alias("d"),
        )
        .groupBy("iso_year", "iso_week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("last_day"),
        )
    )


DATE_ISO_WEEK_BOUNDARY_SQL = """
SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_year,
       CAST(week(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
       CAST(count(*) AS BIGINT) AS n_orders,
       strftime(min(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS first_day,
       strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_day
FROM orders GROUP BY 1, 2
"""


# --- relational division -----------------------------------------------------------


def sql_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose distinct (event_type, ISO week) pairs cover ALL
    observed pairs — division as count-distinct against a 1-row
    broadcast total (the plain all-types divisor is degenerate on this
    fixture: every user has all 5 types)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    ut = ev.select(
        "user_id",
        "event_type",
        F.weekofyear(F.to_date("ts")).cast("long").alias("wk"),
    ).distinct()
    total = ut.select("event_type", "wk").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    per_user = ut.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return (
        per_user.crossJoin(F.broadcast(total))
        .where(F.col("n_pairs") == F.col("n_total"))
        .select(F.col("user_id").cast("long").alias("user_id"), "n_pairs")
    )


SQL_RELATIONAL_DIVISION_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type,
         CAST(week(CAST(ts AS DATE)) AS BIGINT) AS wk
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), total AS (
  SELECT count(*) AS n_total
  FROM (SELECT DISTINCT event_type, wk FROM ut)
), per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs
  FROM ut GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id, n_pairs
FROM per_user, total WHERE n_pairs = n_total
"""


QUERIES: dict[str, QuerySpec] = {
    "sink_csv_quoting_roundtrip": QuerySpec(
        sink_csv_quoting_roundtrip, SINK_CSV_QUOTING_ROUNDTRIP_SQL
    ),
    "sample_stratified_topn": QuerySpec(
        sample_stratified_topn, SAMPLE_STRATIFIED_TOPN_SQL
    ),
    "event_sequence_trigrams": QuerySpec(
        event_sequence_trigrams, EVENT_SEQUENCE_TRIGRAMS_SQL
    ),
    "date_iso_week_boundary": QuerySpec(
        date_iso_week_boundary, DATE_ISO_WEEK_BOUNDARY_SQL
    ),
    "sql_relational_division": QuerySpec(
        sql_relational_division, SQL_RELATIONAL_DIVISION_SQL
    ),
}
