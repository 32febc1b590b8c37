"""Round-6 batch 66 — bitmap distinct, late-data replay, Luhn
validation, run-length sequences, market concentration (overflow
slots):

* ``agg_bitmap_distinct`` — the bitmap-index distinct pattern
  (Druid/ClickHouse style): user ids packed into 32-bit words
  (word = id div 32, bit = id mod 32 — bit 63 is the BIGINT sign bit), bit_or-merged per
  (type, word), popcounts summed — an EXACT mergeable distinct whose
  state is |domain|/32 words, the roaring-bitmap concept in pure SQL.
* ``stream_late_drop_replay`` — watermark semantics as a finite
  replay: arrival position := event time + a bounded md5 jitter
  (≤ 2h — near-ordered arrival, the realistic shape; a pure event_id
  order has NO late data on this fixture and a fully shuffled order
  drops 93%); an event is LATE iff its ts < (running max ts over
  arrivals so far, per user) − 1h.  Kept/dropped counts per type —
  the deterministic batch twin of the engine's real watermark jobs
  (streaming/jobs.py).
* ``str_luhn_checksum`` — Luhn mod-10 over a 16-digit account number
  derived from the order key (md5 digits): per-row validity + the
  expected check digit, aggregated per status — the classic
  data-quality gate, all integer HOFs.
* ``event_type_runs_rle`` — run-length encoding of each user's
  event-type sequence (change-flag → running run id → run lengths):
  n_runs, longest run, and the longest run's type.
* ``agg_hhi_concentration`` — Herfindahl–Hirschman index per nation:
  Σ share_ppm² div 1e6 over suppliers' account-balance shares — the
  market-concentration readout (pairs with agg_gini_concentration).

Scale notes: bitmap words are map-side combinable (the whole sketch
is |domain|/32 longs per group); late-drop is two windows over one
user shuffle; Luhn is scan-side; RLE rides the per-user event-time
window; HHI pre-aggregates per (nation, supplier) before squaring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- bitmap-word exact distinct ----------------------------------------------------


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per type via 32-bit bitmap words:
    bit_or per (type, word), then Σ popcount."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    word = F.expr("user_id div 32").cast("long")
    # 32-bit words: bit 63 of a signed BIGINT is the sign bit and
    # DuckDB rejects 1 << 63 outright — 32-bit packing sidesteps both
    bit = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
    )
    words = (
        ev.select("event_type", word.alias("w"), bit.alias("b"))
        .groupBy("event_type", "w")
        .agg(F.bit_or("b").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("bits")).cast("long").alias("n_distinct_users"),
    )


AGG_BITMAP_DISTINCT_SQL = """
WITH words AS (
  SELECT event_type,
         user_id // 32 AS w,
         bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct_users
FROM words GROUP BY event_type
"""


# --- watermark late-drop replay ----------------------------------------------------


def stream_late_drop_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late iff ts < running-max(ts up to this arrival, per user) − 1h
    with arrival := event time + bounded md5 jitter — the finite
    watermark replay over a near-ordered stream."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    jitter = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(7200 * 1000000)
    )
    arr = ev.select(
        "event_type",
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        (F.unix_micros("ts") + jitter).alias("apos"),
    )
    w = Window.partitionBy("user_id").orderBy("apos", "event_id")
    run_max = F.max("t_us").over(w)
    late = F.col("t_us") < run_max - F.lit(3600 * 1000000)
    return (
        arr.select("event_type", late.alias("late"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("late"), 0).otherwise(1))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("late"), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


STREAM_LATE_DROP_REPLAY_SQL = """
WITH arr AS (
  SELECT event_type, user_id, event_id, epoch_us(ts) AS t_us,
         epoch_us(ts)
         + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                AS BIGINT) % 7200000000 AS apos
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), tagged AS (
  SELECT event_type,
         CASE WHEN t_us <
                   max(t_us) OVER (PARTITION BY user_id
                                   ORDER BY apos, event_id) - 3600000000
              THEN 1 ELSE 0 END AS late
  FROM arr
)
SELECT event_type,
       CAST(sum(1 - late) AS BIGINT) AS n_kept,
       CAST(sum(late) AS BIGINT) AS n_dropped
FROM tagged GROUP BY event_type
"""


# --- Luhn checksum -----------------------------------------------------------------


def str_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-digit account number from md5(orderkey) digits; Luhn
    validity + expected check digit, aggregated per status."""
    o = load_table(spark, sf_dir, "orders")
    # 16 decimal digits: md5 hex bytes folded mod 10 (deterministic)
    acct = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: (
                F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), i, 1), 16, 10)
                .cast("long")
                % 10
            ).cast("string"),
        ),
    )
    digits = F.transform(
        F.regexp_extract_all(F.col("acct"), F.lit("."), 0),
        lambda d: d.cast("long"),
    )
    # Luhn: from the RIGHT, double every 2nd digit (positions 2,4,…),
    # subtract 9 when > 9, sum — valid iff sum % 10 == 0.  Index i is
    # 0-based from the left over 16 digits → right position = 16 − i.
    luhn_sum = F.aggregate(
        F.transform(
            digits,
            lambda d, i: F.when(
                (F.lit(16) - i) % 2 == 0,
                F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2),
            ).otherwise(d),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    staged = o.select(
        F.col("o_orderstatus").alias("status"), acct.alias("acct")
    ).select("status", "acct", luhn_sum.alias("s"))
    return staged.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("s") % 10 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_luhn_valid"),
        F.sum(F.col("s") % 10).cast("long").alias("sum_mod10"),
    )


STR_LUHN_CHECKSUM_SQL = """
WITH acct AS (
  SELECT o_orderstatus AS status,
         list_transform(generate_series(1, 16), i ->
           CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), i, 1))
                AS BIGINT) % 10) AS digits
  FROM orders
), summed AS (
  SELECT status,
         list_sum(list_transform(digits, (d, i) ->
           CASE WHEN (16 - (i - 1)) % 2 = 0
                THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                ELSE d END)) AS s
  FROM acct
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_luhn_valid,
       CAST(sum(s % 10) AS BIGINT) AS sum_mod10
FROM summed GROUP BY status
"""


# --- run-length encoding of type sequences ------------------------------------------


def event_type_runs_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: number of runs, longest run length, longest run's
    type (ties → earlier run) over the (ts, event_id)-ordered types."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = ev.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("chg")
    ).select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum("chg").over(w).alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("run_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    best = F.max(
        F.struct(
            F.col("run_len"), (-F.col("run_id")).alias("neg_rid"), F.col("run_type")
        )
    )
    return per_run.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_events"),
        best["run_len"].cast("long").alias("longest_run"),
        best["run_type"].alias("longest_run_type"),
    )


EVENT_TYPE_RUNS_RLE_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS run_id
  FROM ordered
), per_run AS (
  SELECT user_id, run_id,
         any_value(event_type) AS run_type,
         CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, run_id
), ranked AS (
  SELECT user_id, run_type, run_len,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY run_len DESC, run_id) AS rn
  FROM per_run
)
SELECT CAST(p.user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(p.run_len) AS BIGINT) AS n_events,
       CAST(any_value(r.run_len) AS BIGINT) AS longest_run,
       any_value(r.run_type) AS longest_run_type
FROM per_run p JOIN ranked r ON p.user_id = r.user_id AND r.rn = 1
GROUP BY p.user_id
"""


# --- Herfindahl–Hirschman concentration ---------------------------------------------


def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI per nation over suppliers' positive account balances:
    Σ share_ppm² div 1e6 (10000 = monopoly·1e?, exact integers)."""
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    per_supp = s.select(
        "s_nationkey",
        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal"),
    )
    totals = per_supp.groupBy("s_nationkey").agg(
        F.sum("bal").alias("tot"), F.count(F.lit(1)).alias("n_supp")
    )
    shares = per_supp.join(F.broadcast(totals), "s_nationkey").select(
        "s_nationkey",
        "n_supp",
        F.expr("bal * 1000000 div tot").alias("share_ppm"),
    )
    return shares.groupBy(
        F.col("s_nationkey").cast("long").alias("nationkey")
    ).agg(
        F.max("n_supp").cast("long").alias("n_suppliers"),
        F.expr("CAST(sum(share_ppm * share_ppm) div 1000000 AS BIGINT)")
        .alias("hhi_ppm"),
    )


AGG_HHI_CONCENTRATION_SQL = """
WITH per_supp AS (
  SELECT s_nationkey,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal
  FROM supplier WHERE s_acctbal > 0
), totals AS (
  SELECT s_nationkey, sum(bal) AS tot, count(*) AS n_supp
  FROM per_supp GROUP BY s_nationkey
), shares AS (
  SELECT p.s_nationkey, t.n_supp,
         (p.bal * 1000000) // t.tot AS share_ppm
  FROM per_supp p JOIN totals t ON p.s_nationkey = t.s_nationkey
)
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       CAST(max(n_supp) AS BIGINT) AS n_suppliers,
       CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares GROUP BY s_nationkey
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_bitmap_distinct": QuerySpec(agg_bitmap_distinct, AGG_BITMAP_DISTINCT_SQL),
    "stream_late_drop_replay": QuerySpec(
        stream_late_drop_replay, STREAM_LATE_DROP_REPLAY_SQL
    ),
    "str_luhn_checksum": QuerySpec(str_luhn_checksum, STR_LUHN_CHECKSUM_SQL),
    "event_type_runs_rle": QuerySpec(event_type_runs_rle, EVENT_TYPE_RUNS_RLE_SQL),
    "agg_hhi_concentration": QuerySpec(
        agg_hhi_concentration, AGG_HHI_CONCENTRATION_SQL
    ),
}
