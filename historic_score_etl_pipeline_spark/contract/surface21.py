"""Round-3 batch 28 — JDBC as a SOURCE and stateless feature hashing:

* ``scan_jdbc_roundtrip`` — the reference's delivery target (a SQL
  database over JDBC transport, /root/reference/app/team_utilities.py:341,
  363-365) exercised in BOTH directions: orders staged into embedded
  Apache Derby (a real JDBC driver + SQL engine on Spark's classpath,
  no network), read back through ``spark.read.format("jdbc")``, and
  aggregated.  The oracle runs the same aggregate on the original
  parquet — a FULL value-hash check that the JDBC round-trip is lossless.
* ``text_hashing_tf`` — HashingTF-style feature hashing: tokens hash
  into a fixed number of buckets (md5-derived, engine-portable), term
  frequencies aggregate per (doc, bucket).  The stateless alternative to
  vocabulary-based TF-IDF: no vocab table, no second pass, bounded
  output dimensionality — the standard trick when the corpus is 100 TB
  and the vocabulary won't fit anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- JDBC source round-trip ------------------------------------------------------

_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
_JDBC_KEY_CAP = 3000  # deterministic subset (filter, never limit)


def _stage_table(spark: SparkSession, url: str) -> str:
    """Staging table name for the JDBC round-trip.

    Embedded Derby is already app-scoped via the database DIRECTORY, so
    the plain name is safe there.  On a shared database SERVER
    (SPARK_GRAFT_JDBC_URL) a fixed name + mode=overwrite means two
    concurrent runs clobber each other (ADVICE r10) — suffix with the
    Spark applicationId so each app writes its own table."""
    if url.startswith("jdbc:derby:"):
        return "orders_stage"
    import re

    app = re.sub(r"[^A-Za-z0-9]", "_", spark.sparkContext.applicationId)
    return f"orders_stage_{app}"


def _staged_jdbc_url(spark: SparkSession, sf_dir: str) -> str:
    """Stage a deterministic orders subset into an embedded Derby DB
    (idempotent: mode=overwrite drops and recreates the table)."""
    import os
    import tempfile

    from historic_score_etl_pipeline_spark.contract._staging import (
        reap_stale_siblings,
    )

    # embedded Derby permits ONE JVM per database directory — scope the
    # path by Spark application id so concurrent sessions (pytest +
    # run_parity, hostile + normal) never collide on the boot lock;
    # stale siblings are reaped on the shared deep-mtime liveness rule
    # (_staging.py — root mtime alone would reap a live Derby DB,
    # ADVICE r3)
    # Production path: point SPARK_GRAFT_JDBC_URL at a real database
    # SERVER and the roundtrip runs fully distributed (each write/read
    # task opens its own client connection).  The embedded-Derby default
    # below is a single-JVM test double ONLY: write tasks from two
    # executor JVMs race the boot lock (XSDB6 — caught by the r10
    # 2-worker standalone-cluster parity cell), so off local mode
    # without a server URL we fail loudly rather than flake.
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    if url is None:
        if not spark.sparkContext.master.startswith("local"):
            raise RuntimeError(
                "scan_jdbc_roundtrip requires a database SERVER off "
                "local mode (embedded Derby is single-JVM; executor "
                "JVMs race the boot lock) — set SPARK_GRAFT_JDBC_URL "
                "to a server url"
            )
        tag = os.path.basename(sf_dir.rstrip("/"))
        app = spark.sparkContext.applicationId
        base = tempfile.gettempdir()
        db_dir = os.path.join(base, f"hsep_jdbc_{tag}_{app}")
        reap_stale_siblings(
            base, f"hsep_jdbc_{tag}_", os.path.basename(db_dir)
        )
        url = f"jdbc:derby:{db_dir};create=true"
    df = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < _JDBC_KEY_CAP)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    )
    w = df.write.format("jdbc").option("url", url).option(
        "dbtable", _stage_table(spark, url)
    )
    if url.startswith("jdbc:derby:"):
        w = w.option("driver", _DERBY_DRIVER)
    w.mode("overwrite").save()
    return url


def scan_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders → Derby over JDBC → read back → per-status decimal
    aggregate.  The oracle aggregates the ORIGINAL parquet, so a
    hash-match proves the JDBC write+read is value-lossless (types,
    decimals, strings).  At scale the read side partitions on a numeric
    column (partitionColumn/numPartitions) — a single-partition JDBC
    read of a big table would bottleneck on one task."""
    from historic_score_etl_pipeline_spark.operators.aggregates import (
        decimal_sum_double,
    )

    url = _staged_jdbc_url(spark, sf_dir)
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", _stage_table(spark, url))
        # the scale knobs, exercised for real (4 range-partitioned reads):
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", "0")
        .option("upperBound", str(_JDBC_KEY_CAP))
        .option("numPartitions", "4")
    )
    if url.startswith("jdbc:derby:"):
        r = r.option("driver", _DERBY_DRIVER)
    back = r.load()
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum_double("o_totalprice").alias("sum_price"),
    )


SCAN_JDBC_ROUNDTRIP_SQL = f"""
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderkey < {_JDBC_KEY_CAP}
GROUP BY o_orderstatus
"""


# --- stateless feature hashing ----------------------------------------------------

_HASH_DIM = 64


def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed term frequencies: token → bucket = md5-prefix mod 64, term
    counts aggregated per (doc, bucket).  Stateless (no vocabulary), one
    explode + one map-side-combined shuffle keyed on the doc — the
    100 TB vectorizer.  md5 (not the engine's native hash) keeps buckets
    identical across Spark and DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
        % F.lit(_HASH_DIM)
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


TEXT_HASHING_TF_SQL = f"""
WITH toks AS (
  SELECT doc_id, x AS tok
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS x
        FROM documents)
)
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % {_HASH_DIM} AS bucket,
       CAST(count(*) AS BIGINT) AS tf
FROM toks
GROUP BY doc_id, bucket
"""


# --- linear classifier inference over hashed features -----------------------------

_W_SCALE = 1000  # weights in milli-units
_BIAS_MILLI = 2_354  # bias term, milli-units (centers the synthetic corpus)


def text_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE over the hashed features — the
    fastText-style deployment shape: a trained model is just a
    ``bucket → weight`` table broadcast onto the (doc, bucket, tf) rows,
    ``z = bias + Σ tf·w`` per doc, keep when z > 0.  Weights here are a
    deterministic stand-in (md5-derived integers in [-500, 500) milli-
    units — in production they arrive from training, the dataflow is
    identical); all arithmetic is INTEGER milli-units, so scores are
    exact across engines (a sigmoid would only monotone-transform z, so
    thresholding z directly avoids cross-libm exp() drift).

    Scale shape: reuses the hashed-TF aggregation (one shuffle on doc),
    the 64-row weight table folds in as an expression — no join, no
    second shuffle, no Python."""
    tf = text_hashing_tf(spark, sf_dir)
    w = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), F.col("bucket"))), 1, 4),
            16, 10,
        ).cast("long")
        % F.lit(_W_SCALE)
        - F.lit(_W_SCALE // 2)
    )
    return (
        tf.select("doc_id", (F.col("tf") * w).alias("contrib"))
        .groupBy("doc_id")
        .agg(
            (F.lit(_BIAS_MILLI) + F.sum("contrib"))
            .cast("long")
            .alias("z_milli")
        )
        .select(
            "doc_id", "z_milli", (F.col("z_milli") > 0).alias("keep")
        )
    )


TEXT_CLASSIFIER_LINEAR_SQL = f"""
WITH toks AS (
  SELECT doc_id, x AS tok
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS x
        FROM documents)
),
tf AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % {_HASH_DIM}
           AS bucket,
         count(*) AS tf
  FROM toks GROUP BY 1, 2
)
SELECT doc_id,
       CAST({_BIAS_MILLI} + sum(tf * (
           CAST(('0x' || substr(md5('w:' || CAST(bucket AS VARCHAR)), 1, 4))
                AS BIGINT) % {_W_SCALE} - {_W_SCALE // 2}
       )) AS BIGINT) AS z_milli,
       CAST({_BIAS_MILLI} + sum(tf * (
           CAST(('0x' || substr(md5('w:' || CAST(bucket AS VARCHAR)), 1, 4))
                AS BIGINT) % {_W_SCALE} - {_W_SCALE // 2}
       )) AS BIGINT) > 0 AS keep
FROM tf GROUP BY doc_id
"""


# --- guaranteed heavy hitters (Misra–Gries candidates + exact verify) -------------

_MG_K = 30  # below the 31-token vocabulary → the decrement step fires
_MG_DENOM = 29  # threshold N/29 (valid: 29 < k+1)


def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with frequency > N/29, found at sketch cost but EXACTLY
    (operators/sketches.py::heavy_hitters_exact): per-partition
    Misra–Gries summaries (k=30 counters) certify a candidate superset
    of everything above N/(k+1); one candidate-pruned recount yields
    exact counts.  Deterministic regardless of partitioning — the
    superset varies, the verified thresholded output cannot — which is
    what lets a sketch-based operator carry a value-hash oracle."""
    from historic_score_etl_pipeline_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("tok")
    )
    return heavy_hitters_exact(
        toks, "tok", k=_MG_K, min_share_denom=_MG_DENOM
    )


AGG_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM toks CROSS JOIN tot
GROUP BY tok, tot.n
HAVING count(*) > tot.n // {_MG_DENOM}
"""


# --- text-lines source -------------------------------------------------------------


def _staged_text_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as tab-separated text LINES — the rawest landing
    shape (log files, one record per line).

    Scoped by Spark applicationId (ADVICE r3): a shared path with
    non-atomic mode('overwrite') would let two concurrent sessions
    (pytest + run_parity, explicitly supported) race — one reading a
    partially committed landing dir and silently aggregating fewer rows.
    Per-app dirs are written once then only read; stale siblings are
    reaped on the same deep-mtime liveness rule as the Derby staging."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "text", sf_dir)
    # line-per-row staging is only well-defined for texts without line
    # terminators (an embedded \n/\r would split one doc into two
    # lines); NULL text drops with the same predicate on both engines
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(~F.col("text").contains("\n") & ~F.col("text").contains("\r"))
        .select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.col("lang"),
                F.col("text"),
            ).alias("value")
        )
    )
    docs.write.mode("overwrite").text(out)
    return out


def scan_textfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.read.text`` over staged tab-separated lines — the last
    core reader in the source matrix (parquet/CSV/JSON/ORC/XML/JDBC/
    binaryFile/custom DataSource/text).  Lines split back into typed
    columns with an explicit limit-3 split (text may contain no tabs,
    never inferred), then aggregated per lang; the oracle aggregates the
    original parquet, so the hash match proves the line round-trip is
    lossless — including every non-line-terminator whitespace byte of
    ``text`` (docs with embedded newlines are outside the line-oriented
    format's domain, filtered identically on both engines)."""
    path = _staged_text_dir(spark, sf_dir)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 3)
    parsed = lines.select(
        F.element_at(parts, 1).cast("long").alias("doc_id"),
        F.element_at(parts, 2).alias("lang"),
        F.element_at(parts, 3).alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SCAN_TEXTFILE_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM documents
WHERE NOT contains(text, chr(10)) AND NOT contains(text, chr(13))
GROUP BY lang
"""


QUERIES: dict[str, QuerySpec] = {
    "scan_textfile": QuerySpec(scan_textfile, SCAN_TEXTFILE_SQL),
    "scan_jdbc_roundtrip": QuerySpec(
        scan_jdbc_roundtrip, SCAN_JDBC_ROUNDTRIP_SQL
    ),
    "agg_heavy_hitters": QuerySpec(agg_heavy_hitters, AGG_HEAVY_HITTERS_SQL),
    "text_hashing_tf": QuerySpec(text_hashing_tf, TEXT_HASHING_TF_SQL),
    "text_classifier_linear": QuerySpec(
        text_classifier_linear, TEXT_CLASSIFIER_LINEAR_SQL
    ),
}
