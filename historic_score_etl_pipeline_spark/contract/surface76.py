"""Round-6 batch 83 — packed-binary record ingest, 2-channel Shapley
attribution, session Sankey edges, audio 2× downsample, join-strategy
hints (overflow slots):

* ``scan_binary_packed_records`` — fixed-width BINARY record ingest:
  staged shards of little-endian ``<q q>`` (key, cents) 16-byte records
  read through ``binaryFile`` + an Arrow-batched numpy ``frombuffer``
  unpack — the wire-format cousin of ``scan_fixed_width_file`` (text).
  The oracle replays the payload from orders.
* ``event_attribution_shapley`` — closed-form 2-channel Shapley credit:
  converters exposed to one channel give it full credit, both channels
  split ½/½ — held exact by counting credit × 2; organic conversions
  surfaced separately.
* ``event_path_sankey_edges`` — the Sankey/flow diagram feed: per
  session-step ordinal (user-day sessions), (step, src → dst)
  transition counts for the first 4 steps.
* ``multimodal_audio_downsample_2x`` — decimate-by-2 with pairwise
  fold: per source the downsampled length, Σ|s₂ⱼ + s₂ⱼ₊₁| and the max
  |pair sum| — division-free (Spark ``div`` truncates toward zero,
  DuckDB ``//`` floors: on negatives they disagree, so the op stays in
  sums).
* ``sql_join_strategy_hints`` — Catalyst join-strategy hints as engine
  surface: the same star join once under ``/*+ SHUFFLE_HASH */`` and
  once under ``/*+ MERGE */``, union-tagged; the plan test asserts BOTH
  strategies were actually honored.

Scale notes: the binary unpack is one ``mapInPandas`` pass per shard
(record parsing never leaves the task); Shapley reduces to per-user
booleans then one grouped count; Sankey aggregates the |step×type²|
grid; the downsample is a per-clip fold; hints change the PHYSICAL
strategy only — the hash gate proves result invariance.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- packed-binary record ingest ----------------------------------------------------------

_PACK_SHARDS = 4


def _staged_packed_records(spark: SparkSession, sf_dir: str) -> str:
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "packedbin", sf_dir)
    done = os.path.join(out, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        # No native Spark writer exists for raw packed-binary, so each
        # TASK packs and writes its own shard file — data never visits
        # the driver (ADVICE r6: the old collect() here would OOM at
        # scale).  Executor-side open() only lands in this dir when
        # executors share the driver's filesystem, so fail loudly off
        # local mode (ADVICE r7) instead of staging an empty fixture;
        # a cluster deployment would point `out` at a shared mount.
        # SPARK_GRAFT_SHARED_FS=1 is the deployment's explicit statement
        # that the app dir IS a shared mount (the run_parity --cluster
        # cell: a 2-worker standalone cluster on ONE host, so executor
        # open() genuinely lands where the driver reads) — the documented
        # production path, acknowledged rather than assumed.
        shared = os.environ.get("SPARK_GRAFT_SHARED_FS") == "1"
        if not (spark.sparkContext.master.startswith("local") or shared):
            raise RuntimeError(
                "packed-record staging requires local mode (executor "
                "open() writes to the driver-local app dir); on a "
                "cluster, stage to a shared mount instead and set "
                "SPARK_GRAFT_SHARED_FS=1 to acknowledge it"
            )
        df = (
            load_table(spark, sf_dir, "orders")
            .select(
                F.col("o_orderkey").cast("long").alias("k"),
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("cents"),
            )
            .repartition(_PACK_SHARDS, F.expr(f"k % {_PACK_SHARDS}"))
        )

        def _write_shard(rows) -> None:
            import struct

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            payload = b"".join(
                struct.pack("<qq", r["k"], r["cents"]) for r in rows
            )
            with open(os.path.join(out, f"shard-{pid}.bin"), "wb") as f:
                f.write(payload)

        df.foreachPartition(_write_shard)
        with open(done, "w") as f:
            f.write("ok")
    return out


def scan_binary_packed_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpack staged 16-byte ``<qq`` records Arrow-batched; aggregate
    (count, Σcents, min/max key) per key % 5 bucket."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    path = _staged_packed_records(spark, sf_dir)
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("cents", LongType()),
        ]
    )

    def unpack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["content"]:
                arr = np.frombuffer(blob, dtype="<i8").reshape(-1, 2)
                yield pd.DataFrame({"k": arr[:, 0], "cents": arr[:, 1]})

    recs = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.bin"))
        .select("content")
        .mapInPandas(unpack, schema)
    )
    return recs.groupBy((F.col("k") % 5).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
    )


SCAN_BINARY_PACKED_RECORDS_SQL = """
SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders GROUP BY 1
"""


# --- 2-channel Shapley attribution -----------------------------------------------------------


def event_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per converting user: click-only → click credit 1, view-only →
    view credit 1, both → ½ each (credit held as ×2 integers); neither
    → organic.  One row per channel + organic."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("p"),
    ).where(F.col("p") == 1)
    counts = per_user.agg(
        F.sum(((F.col("c") == 1) & (F.col("v") == 0)).cast("long"))
        .cast("long").alias("click_only"),
        F.sum(((F.col("c") == 0) & (F.col("v") == 1)).cast("long"))
        .cast("long").alias("view_only"),
        F.sum(((F.col("c") == 1) & (F.col("v") == 1)).cast("long"))
        .cast("long").alias("both"),
        F.sum(((F.col("c") == 0) & (F.col("v") == 0)).cast("long"))
        .cast("long").alias("organic"),
    )
    # assemble per-channel rows from the 1-row cell summary (scalar
    # class): credit_x2 = 2·solo + both
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click").alias("channel"),
                    F.col("click_only").alias("solo_converters"),
                    F.col("both").alias("shared_converters"),
                    (2 * F.col("click_only") + F.col("both"))
                    .cast("long")
                    .alias("credit_x2"),
                ),
                F.struct(
                    F.lit("view").alias("channel"),
                    F.col("view_only").alias("solo_converters"),
                    F.col("both").alias("shared_converters"),
                    (2 * F.col("view_only") + F.col("both"))
                    .cast("long")
                    .alias("credit_x2"),
                ),
                F.struct(
                    F.lit("organic").alias("channel"),
                    F.col("organic").alias("solo_converters"),
                    F.lit(0).cast("long").alias("shared_converters"),
                    (2 * F.col("organic")).cast("long").alias("credit_x2"),
                ),
            )
        ).alias("s")
    ).select("s.channel", "s.solo_converters", "s.shared_converters",
             "s.credit_x2")


EVENT_ATTRIBUTION_SHAPLEY_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
), conv AS (
  SELECT * FROM per_user WHERE p = 1
), cells AS (
  SELECT
    CAST(sum(CASE WHEN c = 1 AND v = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS click_only,
    CAST(sum(CASE WHEN c = 0 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS view_only,
    CAST(sum(CASE WHEN c = 1 AND v = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS both_ch,
    CAST(sum(CASE WHEN c = 0 AND v = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS organic
  FROM conv
)
SELECT 'click' AS channel, click_only AS solo_converters,
       both_ch AS shared_converters,
       CAST(2 * click_only + both_ch AS BIGINT) AS credit_x2
FROM cells
UNION ALL
SELECT 'view', view_only, both_ch, CAST(2 * view_only + both_ch AS BIGINT)
FROM cells
UNION ALL
SELECT 'organic', organic, CAST(0 AS BIGINT), CAST(2 * organic AS BIGINT)
FROM cells
"""


# --- session Sankey edges ----------------------------------------------------------------------

_SANKEY_STEPS = 4


def event_path_sankey_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-day sessions: (step, src → dst) transition counts for the
    first 4 steps — the Sankey feed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "event_type",
    ).select(
        "user_id",
        "day",
        "event_type",
        F.row_number().over(w).alias("step"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    return (
        stepped.where(
            F.col("nxt").isNotNull() & (F.col("step") <= _SANKEY_STEPS)
        )
        .groupBy(
            F.col("step").cast("long").alias("step"),
            F.col("event_type").alias("src"),
            F.col("nxt").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


EVENT_PATH_SANKEY_EDGES_SQL = f"""
WITH stepped AS (
  SELECT user_id, event_type,
         row_number() OVER w AS step,
         lead(event_type) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id)
)
SELECT CAST(step AS BIGINT) AS step, event_type AS src, nxt AS dst,
       CAST(count(*) AS BIGINT) AS n
FROM stepped
WHERE nxt IS NOT NULL AND step <= {_SANKEY_STEPS}
GROUP BY 1, 2, 3
"""


# --- audio 2x downsample --------------------------------------------------------------------------


def multimodal_audio_downsample_2x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimate-by-2 pairwise fold over real WAV decode: per source the
    output length, Σ|s₂ⱼ + s₂ⱼ₊₁| and max |pair sum| — division-free so
    both engines agree on negatives."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from historic_score_etl_pipeline_spark.operators.codecs import decode_wav
    from historic_score_etl_pipeline_spark.operators.multimodal import (
        render_text_wav,
    )

    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("n_clips", LongType()),
            StructField("n_out", LongType()),
            StructField("sum_abs_pair", LongType()),
            StructField("max_abs_pair", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict = {}
            for src, t in zip(pdf["source"], pdf["text"]):
                samples, _sr = decode_wav(render_text_wav(t or ""))
                s = samples.reshape(-1).astype(np.int64)
                m = (len(s) // 2) * 2
                pair = s[:m:2] + s[1:m:2]
                n_out = len(pair)
                sa = int(np.abs(pair).sum()) if n_out else 0
                mx = int(np.abs(pair).max()) if n_out else 0
                c, no, su, mm = acc.get(src, (0, 0, 0, 0))
                acc[src] = (c + 1, no + n_out, su + sa, max(mm, mx))
            yield pd.DataFrame(
                {
                    "source": list(acc),
                    "n_clips": [v[0] for v in acc.values()],
                    "n_out": [v[1] for v in acc.values()],
                    "sum_abs_pair": [v[2] for v in acc.values()],
                    "max_abs_pair": [v[3] for v in acc.values()],
                }
            )

    from historic_score_etl_pipeline_spark.operators.multimodal import (
        single_byte_docs,
    )

    docs = single_byte_docs(load_table(spark, sf_dir, "documents"))
    partial = docs.select("source", "text").mapInPandas(batches, schema)
    return partial.groupBy("source").agg(
        F.sum("n_clips").cast("long").alias("n_clips"),
        F.sum("n_out").cast("long").alias("n_out"),
        F.sum("sum_abs_pair").cast("long").alias("sum_abs_pair"),
        F.max("max_abs_pair").cast("long").alias("max_abs_pair"),
    )


MULTIMODAL_AUDIO_DOWNSAMPLE_2X_SQL = """
WITH dims AS (
  SELECT doc_id, source, text,
         strlen(text) AS nb,
         strlen(text) % 441 + 100 AS n
  FROM documents
  WHERE strlen(text) = length(text)
), pairs AS (
  SELECT doc_id, source,
         (CASE WHEN nb = 0 THEN 0
               ELSE (ascii(substr(text, ((2 * t.j) % nb) + 1, 1)) - 128)
                    * 256 END
          + CASE WHEN nb = 0 THEN 0
                 ELSE (ascii(substr(text, ((2 * t.j + 1) % nb) + 1, 1))
                       - 128) * 256 END) AS pair
  FROM dims, unnest(generate_series(0, (n // 2) - 1)) AS t(j)
), per_doc AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_out,
         CAST(sum(abs(pair)) AS BIGINT) AS sa,
         CAST(max(abs(pair)) AS BIGINT) AS mx
  FROM pairs GROUP BY doc_id, source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(n_out) AS BIGINT) AS n_out,
       CAST(sum(sa) AS BIGINT) AS sum_abs_pair,
       CAST(max(mx) AS BIGINT) AS max_abs_pair
FROM per_doc GROUP BY source
"""


# --- join-strategy hints ---------------------------------------------------------------------------


def sql_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same customer⋈orders rollup under SHUFFLE_HASH and MERGE
    hints, union-tagged — identical rows, different physical strategies
    (asserted by the plan test)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_hint_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_hint_customer"
    )
    body = """
        SELECT c.c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM v_hint_customer c JOIN v_hint_orders o
          ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    """
    sh = spark.sql(body.replace("SELECT c.c_nationkey",
                                "SELECT /*+ SHUFFLE_HASH(c) */ c.c_nationkey"))
    mg = spark.sql(body.replace("SELECT c.c_nationkey",
                                "SELECT /*+ MERGE(c) */ c.c_nationkey"))
    return sh.select(F.lit("shuffle_hash").alias("strategy"), "*").unionByName(
        mg.select(F.lit("merge").alias("strategy"), "*")
    )


SQL_JOIN_STRATEGY_HINTS_SQL = """
WITH rollup_q AS (
  SELECT c.c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
)
SELECT 'shuffle_hash' AS strategy, nat, n_orders, cents FROM rollup_q
UNION ALL
SELECT 'merge', nat, n_orders, cents FROM rollup_q
"""


QUERIES: dict[str, QuerySpec] = {
    "scan_binary_packed_records": QuerySpec(
        scan_binary_packed_records, SCAN_BINARY_PACKED_RECORDS_SQL
    ),
    "event_attribution_shapley": QuerySpec(
        event_attribution_shapley, EVENT_ATTRIBUTION_SHAPLEY_SQL
    ),
    "event_path_sankey_edges": QuerySpec(
        event_path_sankey_edges, EVENT_PATH_SANKEY_EDGES_SQL
    ),
    "multimodal_audio_downsample_2x": QuerySpec(
        multimodal_audio_downsample_2x, MULTIMODAL_AUDIO_DOWNSAMPLE_2X_SQL
    ),
    "sql_join_strategy_hints": QuerySpec(
        sql_join_strategy_hints, SQL_JOIN_STRATEGY_HINTS_SQL
    ),
}
