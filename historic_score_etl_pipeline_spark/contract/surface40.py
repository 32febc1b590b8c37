"""Round-6 batch 47 — sink/scan/stream surfaces and two agg staples:

* ``sink_dynamic_partition_overwrite`` — the idempotent-backfill sink:
  a full partitioned write, then a dynamic-mode overwrite of ONLY the
  'O' status partition (restated rows, +1 cent).  Static overwrite
  mode would TRUNCATE the untouched partitions; the read-back
  aggregate proves F/P survived and O was replaced — the daily-
  partition restatement pattern every warehouse pipeline needs.
* ``scan_tsv_gzip`` — gzip-compressed TSV staging + schema-pinned read
  back (compression codec path × delimiter path), aggregated per lang
  so the hash match proves byte-exact round-trip.
* ``stream_hopping_counts`` — hopping (sliding) event-time windows:
  2-day windows sliding 1 day via ``F.window``, each event landing in
  exactly two epoch-aligned windows; the oracle replays the alignment
  arithmetic (day and day−1).
* ``agg_geometric_mean`` — log-domain geometric mean per type: each
  ln(cents) fixpointed to micro-nats BEFORE summation (integer-arg
  ln — the repo's fixpoint convention), the mean emitted as integer
  floor micro-nats; no exp() anywhere, so no second libm trip.
* ``join_values_inline_dim`` — a literal VALUES dim (priority →
  urgency score) broadcast-joined to orders: the inline-lookup-table
  surface (LocalTableScan build side, zero reads) every ETL job uses
  for code→label maps.

Scale notes: the sink writes partition-pruned files and re-reads
through directory pruning; TSV staging is write-once app-scoped; the
hopping window is a 2× bounded explode of the aggregate input; both
aggs are map-side combinable; the VALUES dim is bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


# --- dynamic partition overwrite -------------------------------------------------


def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write orders partitioned by status, dynamically overwrite ONLY
    the 'O' partition with restated rows (cents + 1), read back and
    aggregate — F and P partitions must be untouched."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "dpo", sf_dir)
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(_CENTS).alias("cents"),
        "o_orderstatus",
    )
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    restated = base.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", (F.col("cents") + 1).alias("cents"), "o_orderstatus"
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.schema(
        "o_orderkey long, cents long, o_orderstatus string"
    ).parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


SINK_DYNAMIC_PARTITION_OVERWRITE_SQL = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_CENTS}
                + CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
            AS BIGINT) AS sum_cents
FROM orders GROUP BY o_orderstatus
"""


# --- gzip TSV round-trip ----------------------------------------------------------


def scan_tsv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents as gzip TSV, read back schema-pinned, aggregate
    per lang — codec × delimiter round-trip proof."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "tsvgz", sf_dir)
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars", "text")
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", "true")
        # RFC-4180 quote doubling, not backslash escaping: the default
        # escape='\\' silently EATS literal backslashes on read-back
        .option("escape", '"')
        # the WRITER trims field whitespace by default (both ignore*
        # options default true on write, false on read) — a value ending
        # in spaces/newlines would come back shortened
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("compression", "gzip")
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, lang string, n_chars long, text string")
        .option("sep", "\t")
        .option("header", "true")
        # the writer QUOTES embedded line terminators; without multiLine
        # the reader would split such a record into phantom rows (gzip is
        # whole-file anyway, so multiLine costs nothing here)
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.length("text")).cast("long").alias("total_text_len"),
        F.min("doc_id").cast("long").alias("min_doc"),
    )


SCAN_TSV_GZIP_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS BIGINT) AS total_text_len,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM documents GROUP BY lang
"""


# --- hopping event-time windows -----------------------------------------------------


def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day windows sliding 1 day over event time (epoch-aligned, so
    every event lands in the windows starting at its day and day−1)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    win = F.window("ts", "2 days", "1 day")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.date_format(F.col("w.start").cast("date"), "yyyy-MM-dd").alias(
                "win_start"
            ),
            "event_type",
            "n",
        )
    )


STREAM_HOPPING_COUNTS_SQL = """
WITH hop AS (
  SELECT CAST(ts AS DATE) - i AS win_start, event_type
  FROM events, unnest([0, 1]) AS t(i)
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT strftime(win_start, '%Y-%m-%d') AS win_start, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM hop GROUP BY 1, 2
"""


# --- log-domain geometric mean -------------------------------------------------------


def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean per type in the log domain: Σ floor(ln(cents)·1e6
    + 0.5) exactly, mean as integer floor micro-nats — never exp()."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select("event_type", cents.alias("cents")).where(
        F.col("cents") > 0
    )
    lnfp = F.floor(
        F.log(F.col("cents").cast("double")) * 1e6 + F.lit(0.5)
    ).cast("long")
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(lnfp).cast("long").alias("sum_ln_fp"),
    )
    return agg.select(
        "event_type",
        "n",
        "sum_ln_fp",
        F.expr("sum_ln_fp div n").cast("long").alias("gm_unats"),
    )


AGG_GEOMETRIC_MEAN_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(ln(CAST(cents AS DOUBLE)) * 1e6 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sum_ln_fp
  FROM base WHERE cents > 0
  GROUP BY event_type
)
SELECT event_type, n, sum_ln_fp,
       CAST(sum_ln_fp // n AS BIGINT) AS gm_unats
FROM a
"""


# --- inline VALUES dim ----------------------------------------------------------------

_PRIO_SPARK_VALUES = """
SELECT * FROM VALUES
  ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
  ('4-NOT SPECIFIED', 2), ('5-LOW', 1) AS t(prio, urgency)
"""


def join_values_inline_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders enriched through a literal VALUES lookup dim (priority →
    urgency score), aggregated per urgency — LocalTableScan broadcast,
    zero file reads for the dim."""
    orders = load_table(spark, sf_dir, "orders")
    dim = spark.sql(_PRIO_SPARK_VALUES)
    j = orders.join(
        F.broadcast(dim), orders.o_orderpriority == dim.prio
    )
    return j.groupBy("urgency").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS)).cast("long").alias("sum_cents"),
        F.min("o_orderpriority").alias("prio"),
    ).select(
        F.col("urgency").cast("long").alias("urgency"),
        "n_orders", "sum_cents", "prio",
    )


JOIN_VALUES_INLINE_DIM_SQL = f"""
WITH dim(prio, urgency) AS (
  VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
         ('4-NOT SPECIFIED', 2), ('5-LOW', 1)
)
SELECT CAST(d.urgency AS BIGINT) AS urgency,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum({_CENTS}) AS BIGINT) AS sum_cents,
       min(o.o_orderpriority) AS prio
FROM orders o JOIN dim d ON o.o_orderpriority = d.prio
GROUP BY d.urgency
"""


QUERIES: dict[str, QuerySpec] = {
    "sink_dynamic_partition_overwrite": QuerySpec(
        sink_dynamic_partition_overwrite, SINK_DYNAMIC_PARTITION_OVERWRITE_SQL
    ),
    "scan_tsv_gzip": QuerySpec(scan_tsv_gzip, SCAN_TSV_GZIP_SQL),
    "stream_hopping_counts": QuerySpec(
        stream_hopping_counts, STREAM_HOPPING_COUNTS_SQL
    ),
    "agg_geometric_mean": QuerySpec(
        agg_geometric_mean, AGG_GEOMETRIC_MEAN_SQL
    ),
    "join_values_inline_dim": QuerySpec(
        join_values_inline_dim, JOIN_VALUES_INLINE_DIM_SQL
    ),
}
