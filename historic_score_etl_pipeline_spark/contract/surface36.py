"""Round-6 batch 43 — robust/weighted statistics and grouping metadata:

* ``agg_harmonic_mean`` — per-type harmonic mean with EXACT integer
  reciprocal fixpoints: 1/x becomes ``(2·10¹² + x) div (2x)`` (pure
  BIGINT arithmetic — floor(1e12/x + 0.5) with no float division
  anywhere), summed exactly, one derived double at the end.
* ``agg_trimmed_mean`` — 10 % two-sided trimmed mean by ORDER-STATISTIC
  ranks (row_number with event_id tiebreak; k = n div 10 dropped from
  each tail) — the winsorize lesson applied to trimming: ranked
  elements, never interpolation.
* ``agg_weighted_median`` — quantity-weighted LOWER median of line
  price: smallest value whose running weight reaches half the total
  (2·cumw ≥ W on a totally ordered cumsum) — replayed rank-for-rank in
  SQL.
* ``event_user_type_entropy`` — per-user Shannon entropy of the
  event-type mix, fixpointed per term: h_fp = Σ cᵢ·floor(ln(n/cᵢ)·1e6
  + 0.5) stays an exact integer (the PMI convention; ln args are
  small-integer ratios covered by tests/test_ln_boundary_audit.py's
  convention).
* ``sql_grouping_id`` — ROLLUP with GROUPING metadata: the gid column
  disambiguates "NULL because subtotal" from "NULL in the data" —
  Spark's grouping_id() vs the oracle's 2·GROUPING(r)+GROUPING(n).

Scale notes: every aggregate here is map-side combinable over its
group key; the two window queries partition by the SAME key their
final aggregate groups on (one shuffle, window + agg share it); the
rollup is one Expand + one shuffle; dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_RECIP_ONE = 2_000_000_000_000  # 2·10¹² — reciprocal fixpoint numerator ×2


def _cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


# --- exact harmonic mean --------------------------------------------------------


def agg_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic mean of event value (cents) per type.  Each reciprocal
    is the integer ``(2e12 + x) div (2x)`` ≡ floor(1e12/x + 0.5); the
    sum is exact BIGINT, so both engines agree bit-for-bit and the only
    float op is the final derived mean, rounded once."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = ev.select("event_type", _cents("value").alias("cents")).where(
        F.col("cents") > 0
    )
    recip = F.expr(f"({_RECIP_ONE} + cents) div (2 * cents)")
    agg = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(recip).cast("long").alias("recip_fp_sum"),
    )
    hm = F.round(
        F.col("n").cast("double")
        * F.lit(1.0e12)
        / F.col("recip_fp_sum").cast("double"),
        6,
    )
    return agg.select("event_type", "n", "recip_fp_sum", hm.alias("hm_cents_r6"))


AGG_HARMONIC_MEAN_SQL = f"""
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(({_RECIP_ONE} + cents) // (2 * cents)) AS BIGINT)
           AS recip_fp_sum
  FROM c WHERE cents > 0
  GROUP BY event_type
)
SELECT event_type, n, recip_fp_sum,
       round(CAST(n AS DOUBLE) * 1e12 / CAST(recip_fp_sum AS DOUBLE), 6)
         AS hm_cents_r6
FROM a
"""


# --- two-sided trimmed mean -----------------------------------------------------


def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 % trimmed mean per type: rank values totally (cents,
    event_id), drop k = n div 10 from each tail, average the kept
    cents exactly.  Window and final aggregate share the event_type
    partitioning — one shuffle."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    c = ev.select("event_type", "event_id", _cents("value").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = c.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = ranked.where(
        (F.col("rn") > F.expr("n div 10")) & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    )
    agg = kept.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("cents").cast("long").alias("kept_sum_cents"),
    )
    mean = F.round(
        F.col("kept_sum_cents").cast("double")
        / (F.lit(100.0) * F.col("n_kept").cast("double")),
        4,
    )
    return agg.select(
        "event_type", "n_total", "n_kept", "kept_sum_cents",
        mean.alias("trimmed_mean_r4"),
    )


AGG_TRIMMED_MEAN_SQL = """
WITH c AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
), kept AS (
  SELECT * FROM ranked WHERE rn > n // 10 AND rn <= n - n // 10
), a AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(cents) AS BIGINT) AS kept_sum_cents
  FROM kept GROUP BY event_type
)
SELECT event_type, n_total, n_kept, kept_sum_cents,
       round(CAST(kept_sum_cents AS DOUBLE)
             / (100.0 * CAST(n_kept AS DOUBLE)), 4) AS trimmed_mean_r4
FROM a
"""


# --- weighted lower median ------------------------------------------------------


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted lower median of extended price per return
    flag: the smallest cents value whose cumulative weight (over the
    total order cents → orderkey → linenumber) reaches half the total
    weight (2·cumw ≥ W)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        _cents("l_extendedprice").alias("cents"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    cum = base.select(
        "l_returnflag",
        "cents",
        F.sum("qty").over(w).alias("cumw"),
        F.sum("qty").over(wn).alias("total_w"),
    )
    hit = cum.where(F.lit(2) * F.col("cumw") >= F.col("total_w"))
    return hit.groupBy("l_returnflag").agg(
        F.max("total_w").cast("long").alias("total_qty"),
        F.min("cents").cast("long").alias("wmedian_cents"),
    )


AGG_WEIGHTED_MEDIAN_SQL = """
WITH base AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
  FROM lineitem
), cum AS (
  SELECT l_returnflag, cents,
         sum(qty) OVER (PARTITION BY l_returnflag
                        ORDER BY cents, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         sum(qty) OVER (PARTITION BY l_returnflag) AS total_w
  FROM base
)
SELECT l_returnflag,
       CAST(max(total_w) AS BIGINT) AS total_qty,
       CAST(min(cents) AS BIGINT) AS wmedian_cents
FROM cum WHERE 2 * cumw >= total_w
GROUP BY l_returnflag
"""


# --- per-user behavioral entropy ------------------------------------------------


def event_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix, exact-integer
    fixpoint: h_fp = Σ cᵢ·floor(ln(n/cᵢ)·1e6 + 0.5) (micro-nats ×
    count).  Type counts pre-aggregate map-side; the user total rides
    a window over the compact (user, type) table."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull()
    )
    ct = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wn = Window.partitionBy("user_id")
    ct = ct.withColumn("n", F.sum("c").over(wn))
    surprise = F.floor(
        F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    term = F.col("c") * surprise
    return ct.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(term).cast("long").alias("h_fp"),
    )


EVENT_USER_TYPE_ENTROPY_SQL = """
WITH ct AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY user_id, event_type
), wt AS (
  SELECT user_id, c,
         sum(c) OVER (PARTITION BY user_id) AS n
  FROM ct
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                                * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS h_fp
FROM wt GROUP BY user_id
"""


# --- ROLLUP with grouping metadata ----------------------------------------------


def sql_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts/balances rolled up region → nation with the
    GROUPING bit vector: gid 0 = leaf, 1 = nation subtotal, 3 = grand
    total — the only sound way to tell a subtotal NULL from a data
    NULL."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    j = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.sum(_cents("c_acctbal")).cast("long").alias("bal_cents"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select("r_name", "n_name", "n_custs", "bal_cents", "gid")
    )


SQL_GROUPING_ID_SQL = """
SELECT r.r_name, n.n_name,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents,
       CAST(2 * GROUPING(r.r_name) + GROUPING(n.n_name) AS BIGINT) AS gid
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


QUERIES: dict[str, QuerySpec] = {
    "agg_harmonic_mean": QuerySpec(agg_harmonic_mean, AGG_HARMONIC_MEAN_SQL),
    "agg_trimmed_mean": QuerySpec(agg_trimmed_mean, AGG_TRIMMED_MEAN_SQL),
    "agg_weighted_median": QuerySpec(
        agg_weighted_median, AGG_WEIGHTED_MEDIAN_SQL
    ),
    "event_user_type_entropy": QuerySpec(
        event_user_type_entropy, EVENT_USER_TYPE_ENTROPY_SQL
    ),
    "sql_grouping_id": QuerySpec(sql_grouping_id, SQL_GROUPING_ID_SQL),
}
