"""Round-6 batch 56 — TPC-H completion (q13/q17: the full 22-query
decision-support suite is now covered) plus attribution, migration
checksums, and sentence statistics (overflow slots):

* ``tpch_q13_cust_distribution`` — Q13: the customer order-count
  distribution through a filtered LEFT OUTER join (the filter lives in
  the join, not the WHERE — customers with zero qualifying orders must
  survive with c_count = 0).  Predicate adapted to this schema's
  columns (no o_comment): qualifying orders are the non-urgent ones.
* ``tpch_q17_small_qty_revenue`` — Q17: revenue from small-quantity
  lines of one brand/type bucket, the correlated 0.2·avg(l_quantity)
  subquery decorrelated into a per-partkey aggregate joined back.
  The fractional comparison is integerized (qty < sum/(5n) ⟺
  5·qty·n < sum — quantities are integral) so both engines compare
  exact integers.
* ``event_attribution_linear`` — linear multi-touch attribution:
  every purchase splits 1,000,000 micro-credits equally across the
  user's non-purchase touches in the prior 7 days; the integer
  remainder goes to the EARLIEST touch so credit conserves exactly.
* ``audit_table_checksum`` — the migration-validation fingerprint:
  per order-status, row count + bit_xor and modular sum of the
  md5-derived row hash over a canonical column rendering — two
  engines computing the same table independently must agree bit-for-
  bit (order-insensitive, mergeable, the cross-engine parity story).
* ``text_greedy_wrap_lines`` — the char-budget greedy chunker: how
  many 40-char lines a document wraps into and the longest line — a
  genuinely SEQUENTIAL fold expressed as one ``aggregate`` with a
  struct accumulator (Spark) and a packed-BIGINT ``list_reduce``
  (DuckDB 1.0 has no init-value reduce) — scan-side, no explode.

Reference parity: the reference's scoring tables aggregate per-match
event rows (reference app/main.py building per-team summaries); q13/
q17 are the canonical outer-join-distribution and correlated-scalar
shapes its score rollups imply.  Scale notes: q13 shuffles on custkey
then on the ≤|max orders|-row count distribution; q17 filters lineitem
by a broadcast part dim BEFORE the per-partkey aggregate so the
decorrelated subquery only sees qualifying partkeys; attribution
fan-out is bounded by per-user event density in a 7-day window;
the checksum and sentence stats are scan-side single-aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.functions.digests import (
    DIGEST_MOD,
    fold_modsum,
    fold_xor,
    md5_hash60,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- Q13: customer order-count distribution ----------------------------------------


def tpch_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with the order filter INSIDE the join (zero-order
    customers keep c_count = 0), then the distribution of counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


TPCH_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""


# --- Q17: small-quantity revenue via decorrelated scalar ---------------------------


def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines below 0.2 × the part's average quantity, for one brand/type
    bucket.  Integer-exact: qty < sum/(5n) ⟺ 5·qty·n < sum."""
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    # part filter keeps or drops WHOLE partkeys, so filtering before the
    # per-partkey aggregate leaves the correlated average unchanged
    fl = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    stats = fl.groupBy(F.col("l_partkey").alias("s_pkey")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )
    small = fl.join(stats, F.col("l_partkey") == F.col("s_pkey")).where(
        F.lit(5) * F.col("qty") * F.col("n_lines") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small_lines"),
        F.sum("cents").cast("long").alias("rev_cents"),
    ).select(
        "n_small_lines",
        "rev_cents",
        # integer div (Spark `div` ≡ DuckDB `//`, both truncate toward
        # zero) — a double /7 could truncate across an integer boundary
        F.expr("rev_cents div 7").cast("long").alias("avg_yearly_cents"),
    )


TPCH_Q17_SQL = """
WITH fl AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
), stats AS (
  SELECT l_partkey AS s_pkey, sum(qty) AS sum_qty, count(*) AS n_lines
  FROM fl GROUP BY l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
       CAST(sum(cents) AS BIGINT) AS rev_cents,
       CAST(CAST(sum(cents) AS BIGINT) // 7 AS BIGINT) AS avg_yearly_cents
FROM fl JOIN stats ON l_partkey = s_pkey
WHERE 5 * qty * n_lines < sum_qty
"""


# --- linear multi-touch attribution ------------------------------------------------


def event_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1,000,000 micro-credits per purchase split equally over the
    user's non-purchase touches in [p_ts − 7d, p_ts); the remainder
    goes to the earliest touch (ts, event_id order) so
    Σcredit = 1e6 × touched purchases exactly."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_id", "event_type", "ts"
    )
    j = touch.join(purch, "user_id").where(
        (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("p_id")
    wo = w.orderBy("ts", "event_id")
    n = F.count(F.lit(1)).over(w)
    rn = F.row_number().over(wo)
    # long/long `/` is double division; truncation is exact here because
    # q = 1e6/n has |error| < half-ulp ≪ the r/n ≥ 1e-6 gap below the
    # next integer (and exact-integer quotients are exactly representable)
    credit = (F.lit(1000000) / n).cast("long") + F.when(
        rn == 1, F.lit(1000000) % n
    ).otherwise(F.lit(0))
    return (
        j.select("event_type", "p_id", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.sum("credit").cast("long").alias("credit_micros"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("p_id").cast("long").alias("n_purchases"),
        )
    )


EVENT_ATTRIBUTION_LINEAR_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, ts FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), j AS (
  SELECT t.event_type, p.event_id AS p_id, t.ts, t.event_id
  FROM ev t JOIN (SELECT user_id, event_id, ts FROM ev
                  WHERE event_type = 'purchase') p
    ON t.user_id = p.user_id
  WHERE t.event_type <> 'purchase'
    AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
), credited AS (
  SELECT event_type,
         p_id,
         1000000 // count(*) OVER (PARTITION BY p_id)
         + CASE WHEN row_number() OVER (PARTITION BY p_id
                                        ORDER BY ts, event_id) = 1
                THEN 1000000 % count(*) OVER (PARTITION BY p_id)
                ELSE 0 END AS credit
  FROM j
)
SELECT event_type,
       CAST(sum(credit) AS BIGINT) AS credit_micros,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
FROM credited GROUP BY event_type
"""


# --- migration-validation table checksum -------------------------------------------

def audit_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-status fingerprint of orders: bit_xor and
    modular sum of the md5 row hash over a canonical rendering (shared
    digest idiom: functions/digests.py)."""
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.col("o_orderdate").cast("string"),
        F.col("o_orderpriority"),
    )
    h = md5_hash60(canon)
    return o.select(F.col("o_orderstatus"), h.alias("h")).groupBy(
        "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        fold_xor(F.col("h")).alias("xor_sig"),
        fold_modsum(F.col("h")).alias("sum_sig"),
    )


AUDIT_TABLE_CHECKSUM_SQL = f"""
WITH hashed AS (
  SELECT o_orderstatus,
         CAST(('0x' || substr(md5(concat_ws('|',
              CAST(o_orderkey AS VARCHAR),
              CAST(o_custkey AS VARCHAR),
              o_orderstatus,
              CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
              CAST(o_orderdate AS VARCHAR),
              o_orderpriority)), 1, 15)) AS BIGINT) AS h
  FROM orders
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h) AS BIGINT) AS xor_sig,
       CAST(sum(h % {DIGEST_MOD}) AS BIGINT) AS sum_sig
FROM hashed GROUP BY o_orderstatus
"""


# --- greedy char-budget line packing ----------------------------------------------

_WRAP_W = 40


def text_greedy_wrap_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy word-wrap at a 40-char budget (the char-budget chunker:
    how many lines/chunks a doc needs, and the longest one) — a single
    sequential ``aggregate`` fold with a struct accumulator, no explode.
    A token longer than the budget occupies its own over-long line."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    zero = F.struct(
        F.lit(0).cast("long").alias("n"),   # closed + open lines
        F.lit(0).cast("long").alias("mx"),  # longest CLOSED line
        F.lit(0).cast("long").alias("cur"),  # open-line length
    )

    def _step(acc, x):
        ln = F.length(x).cast("long")
        cost = acc["cur"] + F.when(acc["cur"] > 0, 1).otherwise(0) + ln
        fits = (cost <= _WRAP_W) & (acc["n"] > 0)
        return F.struct(
            F.when(fits, acc["n"]).otherwise(acc["n"] + 1).alias("n"),
            F.when(fits, acc["mx"])
            .otherwise(F.greatest(acc["mx"], acc["cur"]))
            .alias("mx"),
            F.when(fits, cost).otherwise(ln).alias("cur"),
        )

    folded = F.aggregate(toks, zero, _step)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        folded["n"].alias("n_lines"),
        F.greatest(folded["mx"], folded["cur"]).alias("max_line_len"),
    )


# accumulator packed into one BIGINT (n·1e8 + mx·1e4 + cur) because
# DuckDB 1.0 list_reduce has no initial-value form: the first element is
# pre-encoded as "one open line of len₀" via the (x, i) transform
TEXT_GREEDY_WRAP_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
), enc AS (
  SELECT doc_id, len(t) AS n_tokens,
         list_transform(t, (x, i) ->
           CASE WHEN i = 1 THEN 100000000 + len(x)
                ELSE CAST(len(x) AS BIGINT) END) AS e
  FROM toks
), folded AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens = 0 THEN 0
              ELSE list_reduce(e, (acc, x) ->
                CASE WHEN (acc % 10000)
                          + CASE WHEN acc % 10000 = 0 THEN 0 ELSE 1 END
                          + x <= {_WRAP_W}
                     THEN acc + x
                          + CASE WHEN acc % 10000 = 0 THEN 0 ELSE 1 END
                     ELSE (acc // 100000000 + 1) * 100000000
                          + greatest((acc // 10000) % 10000,
                                     acc % 10000) * 10000
                          + x END) END AS f
  FROM enc
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(f // 100000000 AS BIGINT) AS n_lines,
       CAST(greatest((f // 10000) % 10000, f % 10000) AS BIGINT)
         AS max_line_len
FROM folded
"""


QUERIES: dict[str, QuerySpec] = {
    "tpch_q13_cust_distribution": QuerySpec(
        tpch_q13_cust_distribution, TPCH_Q13_SQL
    ),
    "tpch_q17_small_qty_revenue": QuerySpec(
        tpch_q17_small_qty_revenue, TPCH_Q17_SQL
    ),
    "event_attribution_linear": QuerySpec(
        event_attribution_linear, EVENT_ATTRIBUTION_LINEAR_SQL
    ),
    "audit_table_checksum": QuerySpec(
        audit_table_checksum, AUDIT_TABLE_CHECKSUM_SQL
    ),
    "text_greedy_wrap_lines": QuerySpec(
        text_greedy_wrap_lines, TEXT_GREEDY_WRAP_SQL
    ),
}
