"""Round-5 batch 41 — association, robust-stats, and corpus-stitching
staples:

* ``event_cooccurrence_pmi`` — pointwise mutual information of event-
  type pairs co-occurring in (user, day) sessions.  Counts are exact
  integers; the single ``ln`` per output row is fixpointed to
  micro-nats directly (no summation of float terms at all — the
  safest shape a log statistic can take).
* ``window_winsorize_clip`` — per-user winsorization at the p10/p90
  ORDER STATISTICS: the clip bounds are ranked elements (ceil-index
  selection, event_id tiebreak), never interpolated — the round-4 MAD
  lesson applied to quantile clipping.  Everything integer cents.
* ``text_split_doc_stitch`` — split-document detection: doc B is a
  candidate continuation of doc A when A's LAST 3-token shingle
  equals B's FIRST 3-token shingle (same language, A≠B).  One
  equi-join on the boundary gram — never a doc×doc scan; at corpus
  scale a `max_df` cap on boilerplate grams bounds the fan-out the
  same way the substring-span dedup caps per-gram pairs.
* ``agg_skew_kurt`` — per-event-type skewness and excess kurtosis
  from RAW integer power sums: Σx..Σx⁴ accumulate exactly
  (DECIMAL(38,0) in Spark, HUGEINT in DuckDB — both lossless for
  cents⁴ at any realistic scale), and the float arithmetic happens
  once per GROUP on the final scalars with an identical operation
  order (sqrt, not pow — pow is the libm-divergence trap).
* ``sql_any_all_semijoin`` — the ANY/ALL comparison-subquery surface:
  ``> ALL`` (anti-ish threshold) and ``= ANY`` (IN) in one statement,
  run through spark.sql over temp views so Catalyst's decorrelation
  is what's exercised — the DataFrame API has no ALL spelling.

Scale notes: PMI joins are |types|²-bounded broadcasts above a
map-combinable session aggregate; winsorize windows are user-
partitioned (no global sort); stitch is a gram equi-join; skew/kurt
is one pass of map-side-combinable power sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- PMI of session co-occurrence ----------------------------------------------


def event_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI of unordered event-type pairs over (user, day) sessions.
    pmi = ln(c_xy·N / (c_x·c_y)) — one integer-ratio log per pair,
    fixpointed to micro-nats.  The pair join runs on the DISTINCT
    session-type table (≤ |sessions|·|types| rows) and the marginals
    are a broadcast |types|-row table."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    st = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
    ).distinct()
    # session total as a broadcast 1-row DF folded into the expression —
    # no driver action (the bigram_surprisal lesson: a .count() scalar
    # costs a separate job and breaks the single lazy plan)
    sess = (
        st.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    singles = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = st.select("user_id", "day", F.col("event_type").alias("type_x"))
    b = st.select("user_id", "day", F.col("event_type").alias("type_y"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .where(F.col("type_x") < F.col("type_y"))
        .groupBy("type_x", "type_y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    sx = singles.select(
        F.col("event_type").alias("type_x"), F.col("c").alias("n_x")
    )
    sy = singles.select(
        F.col("event_type").alias("type_y"), F.col("c").alias("n_y")
    )
    pmi = F.floor(
        F.log(
            (F.col("n_xy") * F.col("n_sessions")).cast("double")
            / (F.col("n_x") * F.col("n_y")).cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        pairs.join(F.broadcast(sx), "type_x")
        .join(F.broadcast(sy), "type_y")
        .crossJoin(F.broadcast(sess))
        .select(
            "type_x",
            "type_y",
            "n_xy",
            "n_x",
            "n_y",
            "n_sessions",
            pmi.alias("pmi_unats"),
        )
    )


EVENT_COOCCURRENCE_PMI_SQL = """
WITH st AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), sess AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sessions
  FROM (SELECT DISTINCT user_id, day FROM st)
), singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c
  FROM st GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_x, b.event_type AS type_y,
         CAST(count(*) AS BIGINT) AS n_xy
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_x, p.type_y, p.n_xy,
       sx.c AS n_x, sy.c AS n_y, s.n_sessions,
       CAST(floor(ln(CAST(p.n_xy * s.n_sessions AS DOUBLE)
                     / CAST(sx.c * sy.c AS DOUBLE)) * 1e6 + 0.5)
            AS BIGINT) AS pmi_unats
FROM pairs p
JOIN singles sx ON p.type_x = sx.event_type
JOIN singles sy ON p.type_y = sy.event_type
CROSS JOIN sess s
"""


# --- winsorize at order statistics ---------------------------------------------


def window_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user winsorized sum: clip cents at the p10/p90 order
    statistics — the ranked element at ceil(q·n), event_id tiebreak,
    NO interpolation — then Σ clamp(x, lo, hi).  Two user-partitioned
    windows + one aggregate; nothing global.  NULL observations are
    filtered on BOTH engines up front — a NULL cents would rank NULLS
    FIRST in Spark but NULLS LAST in DuckDB and shift every order
    statistic (adversarial-fixture sweep)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.col("cents").asc(), F.col("event_id").asc()
    )
    full = Window.partitionBy("user_id")
    base = ev.select("user_id", "event_id", cents.alias("cents"))
    ranked = base.select(
        "user_id",
        "cents",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(full).cast("long").alias("n"),
    )
    k_lo = (F.col("n") * 10 + 99) / 100  # ceil(0.1·n) via int arithmetic
    k_hi = (F.col("n") * 90 + 99) / 100
    marked = ranked.select(
        "user_id",
        "cents",
        "n",
        F.when(
            F.col("rn") == F.floor(k_lo).cast("long"), F.col("cents")
        ).alias("lo_hit"),
        F.when(
            F.col("rn") == F.floor(k_hi).cast("long"), F.col("cents")
        ).alias("hi_hit"),
    )
    bounds = marked.select(
        "user_id",
        "cents",
        "n",
        F.max("lo_hit").over(full).alias("lo"),
        F.max("hi_hit").over(full).alias("hi"),
    )
    clipped = F.greatest(F.least(F.col("cents"), F.col("hi")), F.col("lo"))
    return bounds.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.max("lo").alias("lo_cents"),
        F.max("hi").alias("hi_cents"),
        F.sum(clipped).cast("long").alias("winsorized_sum_cents"),
        F.sum("cents").cast("long").alias("raw_sum_cents"),
    )


WINDOW_WINSORIZE_CLIP_SQL = """
WITH base AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE value IS NOT NULL
), ranked AS (
  SELECT user_id, cents,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY cents ASC, event_id ASC)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM base
), marked AS (
  SELECT user_id, cents, n,
         CASE WHEN rn = (n * 10 + 99) // 100 THEN cents END AS lo_hit,
         CASE WHEN rn = (n * 90 + 99) // 100 THEN cents END AS hi_hit
  FROM ranked
), bounds AS (
  SELECT user_id, cents, n,
         max(lo_hit) OVER (PARTITION BY user_id) AS lo,
         max(hi_hit) OVER (PARTITION BY user_id) AS hi
  FROM marked
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(max(lo) AS BIGINT) AS lo_cents,
       CAST(max(hi) AS BIGINT) AS hi_cents,
       CAST(sum(greatest(least(cents, hi), lo)) AS BIGINT)
         AS winsorized_sum_cents,
       CAST(sum(cents) AS BIGINT) AS raw_sum_cents
FROM bounds GROUP BY user_id
"""


# --- split-document stitch detection -------------------------------------------


def text_split_doc_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose boundary shingles chain: A's last 3 tokens == B's
    first 3 tokens (same lang, A≠B) → B likely continues A.  One
    equi-join on the boundary gram — the split-document repair pass
    of a crawl pipeline.  Docs under 3 tokens are skipped."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select(
        "doc_id", "lang", toks.alias("t"), F.size(toks).alias("nt")
    ).where(F.col("nt") >= 3)
    head = F.concat_ws(" ", F.slice(F.col("t"), 1, 3))
    tail = F.concat_ws(" ", F.slice(F.col("t"), -3, 3))
    a = base.select(
        F.col("doc_id").alias("id_a"), "lang", tail.alias("gram")
    )
    b = base.select(
        F.col("doc_id").alias("id_b"), "lang", head.alias("gram")
    )
    return (
        a.join(b, ["lang", "gram"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "lang", "gram")
    )


TEXT_SPLIT_DOC_STITCH_SQL = """
WITH base AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
), sized AS (
  SELECT doc_id, lang, t, len(t) AS nt FROM base WHERE len(t) >= 3
), a AS (
  SELECT doc_id AS id_a, lang,
         concat_ws(' ', t[nt-2], t[nt-1], t[nt]) AS gram
  FROM sized
), b AS (
  SELECT doc_id AS id_b, lang,
         concat_ws(' ', t[1], t[2], t[3]) AS gram
  FROM sized
)
SELECT a.id_a, b.id_b, a.lang, a.gram
FROM a JOIN b ON a.lang = b.lang AND a.gram = b.gram
WHERE a.id_a <> b.id_b
"""


# --- skewness / kurtosis from integer power sums --------------------------------


def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type from raw
    integer power sums Σx..Σx⁴ (x = cents).  The sums are lossless —
    DECIMAL(38,0) holds cents⁴ sums through any fixture scale — and
    the per-GROUP float arithmetic is spelled with one operation
    order in both engines (sqrt(m2), never pow(m2, 1.5): engine libm
    pow is the classic 1-ulp divergence).  Zero-variance groups emit
    NULL (the corr-matrix guard).  Results fixpointed to 1e-6."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(38,0)")
    sums = (
        ev.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.col("x") * F.col("x")).alias("s2"),
            F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
            F.sum(
                (F.col("x") * F.col("x")) * (F.col("x") * F.col("x"))
            ).alias("s4"),
        )
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * (mean * mean) * (s2 / n)
        - 3 * (mean * mean) * (mean * mean)
    )
    skew = F.when(
        m2 > 0,
        F.floor(m3 / (m2 * F.sqrt(m2)) * F.lit(1e6) + F.lit(0.5)).cast(
            "long"
        ),
    )
    kurt = F.when(
        m2 > 0,
        F.floor((m4 / (m2 * m2) - 3) * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    return sums.select(
        "event_type",
        "n",
        skew.alias("skew_r6fp"),
        kurt.alias("kurt_r6fp"),
    )


AGG_SKEW_KURT_SQL = """
WITH sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(x) AS s1, sum(x * x) AS s2,
         sum(x * x * x) AS s3, sum((x * x) * (x * x)) AS s4
  FROM (SELECT event_type,
               CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
                 AS x
        FROM events WHERE value IS NOT NULL)
  GROUP BY event_type
), moments AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
         CAST(s4 AS DOUBLE) AS s4d
  FROM sums
), m AS (
  SELECT event_type, n, nd, mean,
         s2d / nd - mean * mean AS m2,
         s3d / nd - 3 * mean * (s2d / nd) + 2 * mean * mean * mean AS m3,
         s4d / nd - 4 * mean * (s3d / nd)
           + 6 * (mean * mean) * (s2d / nd)
           - 3 * (mean * mean) * (mean * mean) AS m4
  FROM moments
)
SELECT event_type, n,
       CASE WHEN m2 > 0 THEN
         CAST(floor(m3 / (m2 * sqrt(m2)) * 1e6 + 0.5) AS BIGINT)
       END AS skew_r6fp,
       CASE WHEN m2 > 0 THEN
         CAST(floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) AS BIGINT)
       END AS kurt_r6fp
FROM m
"""


# --- ANY / ALL comparison subqueries --------------------------------------------


def sql_any_all_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries: ``> ALL`` + ``IN``.  Spark SQL
    has no ALL/ANY spelling (PARSE_SYNTAX_ERROR, verified), so the
    Spark side runs the rewrite every engine lowers ALL into —
    ``> (SELECT max(...))`` — while the DuckDB oracle keeps the
    literal ``> ALL``: the hash match IS the proof the rewrite is
    equivalent.  (Equivalence caveat, not hit here: over an EMPTY
    subquery ALL is TRUE but max is NULL; the 1-URGENT group set is
    never empty.)  The IN runs through Catalyst's left-semi
    decorrelation on both sides."""
    for t in ("orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(SQL_ANY_ALL_SPARK)


SQL_ANY_ALL_SPARK = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM v_orders o
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_totalprice > (
        SELECT max(avg_tp) FROM (
          SELECT avg(o2.o_totalprice) AS avg_tp FROM v_orders o2
          WHERE o2.o_orderpriority = '1-URGENT'
          GROUP BY o2.o_orderstatus))
  AND o.o_custkey IN (
        SELECT c.c_custkey FROM v_customer c
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        JOIN v_region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA')
"""

SQL_ANY_ALL_SEMIJOIN_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM orders o
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_totalprice > ALL (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_orderpriority = '1-URGENT'
        GROUP BY o2.o_orderstatus)
  AND o.o_custkey IN (
        SELECT c.c_custkey FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA')
"""


QUERIES: dict[str, QuerySpec] = {
    "event_cooccurrence_pmi": QuerySpec(
        event_cooccurrence_pmi, EVENT_COOCCURRENCE_PMI_SQL
    ),
    "window_winsorize_clip": QuerySpec(
        window_winsorize_clip, WINDOW_WINSORIZE_CLIP_SQL
    ),
    "text_split_doc_stitch": QuerySpec(
        text_split_doc_stitch, TEXT_SPLIT_DOC_STITCH_SQL
    ),
    "agg_skew_kurt": QuerySpec(agg_skew_kurt, AGG_SKEW_KURT_SQL),
    "sql_any_all_semijoin": QuerySpec(
        sql_any_all_semijoin, SQL_ANY_ALL_SEMIJOIN_SQL
    ),
}
