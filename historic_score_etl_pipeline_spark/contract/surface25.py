"""Round-4 batch 32 — lake-maintenance and ingest-robustness staples:

* ``sink_compact_files`` — small-file compaction: a landing zone of 64
  tiny parquet files rewritten into ≤4 right-sized ones (repartition +
  write), then read back and aggregated.  THE recurring 100 TB
  maintenance job: small files blow up listing time, task counts, and
  NameNode/row-group overhead; the oracle (aggregating the original
  table) proves compaction is content-lossless, and the pytest twin
  pins the file-count reduction.
* ``scan_csv_quoted_multiline`` — CSV with embedded delimiters, quotes,
  AND newlines round-tripped through quoteAll + multiLine read: the
  ingest edge that silently corrupts naive line-based CSV splitters.
  The oracle computes from the original table, so a hash match proves
  the quoted round-trip preserved every byte.
* ``agg_week_rollup`` — ISO-week revenue rollup via ``date_trunc``
  (Monday-start in BOTH engines, probed): weekly grids are the classic
  cross-engine divergence trap (week-of-year numbering differs); the
  truncated DATE is surfaced as a string per the DATE-boundary
  convention.
* ``stream_dedup_firstwins`` — first-occurrence-wins dedup per
  (user, type, amount) with a total-order tiebreak: the batch
  equivalence class of streaming ``dropDuplicatesWithinWatermark`` on a
  finite replay (the REAL streaming operator + its bounded-state
  semantics live in streaming/jobs.py::dedup_within_watermark_stream
  with its own pytest twin), and the earliest-wins complement of
  ``dedup_latest_snapshot``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- small-file compaction ----------------------------------------------------

_FRAGMENT_FILES = 64
_COMPACT_TARGET = 4


def _staged_fragmented_orders(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders as an intentionally fragmented landing zone."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "frag", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartition(_FRAGMENT_FILES)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def compact_dir(spark: SparkSession, src: str, dst: str,
                target_files: int = _COMPACT_TARGET) -> None:
    """Rewrite a fragmented parquet dir into ``target_files`` outputs.
    At 100 TB the target count comes from bytes/128 MB per partition;
    here it is pinned so the pytest twin can assert the reduction.
    Content-preserving by construction — repartition is a shuffle, not
    a transformation."""
    spark.read.parquet(src).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(dst)


def sink_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment → compact → read back → aggregate.  The oracle runs the
    same aggregate on the ORIGINAL orders table: a hash match proves the
    two rewrites lost nothing."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    src = _staged_fragmented_orders(spark, sf_dir)
    dst = app_scoped_dir(spark, "compact", sf_dir)
    compact_dir(spark, src, dst)
    back = spark.read.parquet(dst)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


SINK_COMPACT_FILES_SQL = """
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM orders GROUP BY o_orderstatus
"""


# --- quoted / multiline CSV round-trip ----------------------------------------


def _gnarly_note() -> F.Column:
    """A value exercising every CSV hazard at once: embedded delimiter,
    embedded double-quote, embedded NEWLINE, then real data."""
    return F.concat(
        F.lit('memo,"x"'), F.lit("\n"), F.col("o_orderpriority")
    )


def _staged_quoted_csv(spark: SparkSession, sf_dir: str) -> str:
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "qcsv", sf_dir)
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", _gnarly_note().alias("note"))
        .write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .csv(out)
    )
    return out


def scan_csv_quoted_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the hazard CSV back (explicit schema + multiLine — a naive
    line splitter would shear every record at the embedded newline) and
    fingerprint the notes per derived priority.  The oracle rebuilds the
    note from the original table: the hash match proves every comma,
    quote, and newline byte survived the round-trip."""
    path = _staged_quoted_csv(spark, sf_dir)
    back = (
        spark.read.schema("o_orderkey long, note string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )
    prio = F.element_at(F.split(F.col("note"), "\n"), 2)
    return back.groupBy(prio.alias("prio")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.length("note")).cast("long").alias("total_note_chars"),
        F.min("o_orderkey").alias("min_key"),
    )


SCAN_CSV_QUOTED_MULTILINE_SQL = """
WITH notes AS (
  SELECT o_orderkey,
         'memo,"x"' || chr(10) || o_orderpriority AS note,
         o_orderpriority AS prio
  FROM orders
)
SELECT prio, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(note)) AS BIGINT) AS total_note_chars,
       min(o_orderkey) AS min_key
FROM notes GROUP BY prio
"""


# --- ISO-week rollup ----------------------------------------------------------


def agg_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue grid keyed by the Monday of each ISO week —
    ``date_trunc('week', …)`` is Monday-start in both engines (probed),
    unlike week-of-year NUMBERING which diverges and is avoided.  The
    week key surfaces as a string (DATE-boundary convention)."""
    orders = load_table(spark, sf_dir, "orders")
    week = (
        F.date_trunc("week", F.col("o_orderdate")).cast("date").cast("string")
    )
    return orders.groupBy(week.alias("week_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


AGG_WEEK_ROLLUP_SQL = """
SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR)
         AS week_start,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY week_start
"""


# --- first-occurrence-wins dedup ---------------------------------------------


def stream_dedup_firstwins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest event per (user, type, cents) with a total-order
    tiebreak — the finite-replay equivalence class of streaming
    ``dropDuplicatesWithinWatermark`` (whose real bounded-state run is
    streaming/jobs.py::dedup_within_watermark_stream), and the
    first-wins mirror of ``dedup_latest_snapshot``.  Same scale shape:
    one shuffle, WindowGroupLimit keeps per-key state at one row."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id", "event_type", "cents").orderBy(
        "first_ts_us", "event_id"
    )
    return (
        ev.select(
            "user_id", "event_type", cents.alias("cents"),
            F.unix_micros("ts").alias("first_ts_us"),
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "cents", "first_ts_us",
            F.col("event_id").alias("first_event_id"),
        )
    )


STREAM_DEDUP_FIRSTWINS_SQL = """
SELECT user_id, event_type, cents, first_ts_us, first_event_id
FROM (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS first_ts_us,
         event_id AS first_event_id,
         row_number() OVER (
           PARTITION BY user_id, event_type,
                        CAST(floor(value * 100 + 0.5) AS BIGINT)
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
) WHERE rn = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "sink_compact_files": QuerySpec(sink_compact_files, SINK_COMPACT_FILES_SQL),
    "scan_csv_quoted_multiline": QuerySpec(
        scan_csv_quoted_multiline, SCAN_CSV_QUOTED_MULTILINE_SQL
    ),
    "agg_week_rollup": QuerySpec(agg_week_rollup, AGG_WEEK_ROLLUP_SQL),
    "stream_dedup_firstwins": QuerySpec(
        stream_dedup_firstwins, STREAM_DEDUP_FIRSTWINS_SQL
    ),
}
