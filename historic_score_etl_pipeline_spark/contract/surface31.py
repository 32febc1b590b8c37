"""Round-5 batch 38 — warehouse/time-series staples:

* ``join_point_in_time`` — the SCD2 point-in-time join: each order
  matched to the dimension row VALID AT its order date.  The
  valid-range dimension is built from the customers' own order
  history (rank windows → [valid_from, valid_to) ranges), then the
  probe is an as-of-style join.  THE query every warehouse with
  slowly-changing dimensions runs; degenerates to a broadcast range
  probe because a dimension is orders of magnitude smaller than the
  fact side.
* ``agg_log2_histogram`` — power-of-two value histogram per event
  type: bin = ⌊log2(cents)⌋ computed as base-2 STRING LENGTH − 1
  (pure integer, no float log to diverge by an ulp at bin edges) —
  the latency/size telemetry histogram.
* ``event_interarrival_median`` — exact lower-median inter-event gap
  per user WITHOUT collecting a group to one row: gaps via lag, then
  rank-vs-count selection (row_number = ⌊(n+1)/2⌋).  Scale shape:
  two window passes over the same user-keyed sort — works for a user
  with 10M events where a collect_list would OOM.
* ``text_zipf_slope`` — Zipf exponent per language fitted by least
  squares over (ln rank, ln freq), every logarithm fixpointed to
  integer micro-nats BEFORE the sums so the regression inputs are
  exact integers cross-engine; one double division at the end,
  rounded.
* ``window_peak_local_max`` — strict local maxima over the per-user
  series (greater than both neighbors): the O(1)-state peak detector,
  one lag + one lead over a single sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- SCD2 point-in-time join --------------------------------------------------


def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's orders, priced with the acctbal TIER the
    customer was in at order time — the dimension versions are the
    customer's own orders sorted by date (each order bumps the tier
    deterministically), giving a real [from, to) validity chain to
    probe.  The probe is rank-window based: one user-keyed sort shared
    by version build and probe."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    # dimension versions: customer tier after their k-th order (k is a
    # deterministic stand-in for a mutating dim attribute)
    wv = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.row_number().over(wv).alias("version"),
    )
    # probe: as-of backward — the version with the greatest valid_from
    # <= the order date; same-day versions resolve by the deterministic
    # (valid_from, version) order.  Implemented as the rank window
    # itself: version k is by construction the row valid AT order k.
    probed = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("string").alias("o_date"),
        F.row_number().over(wv).alias("version_at_order"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    joined = probed.join(
        versions,
        (probed.o_custkey == versions.o_custkey)
        & (probed.version_at_order == versions.version),
    )
    # all-integer tier pricing (cents × (100 + version), i.e. centi-
    # cents): decimal division rules differ between engines, integer
    # multiplication doesn't
    return joined.select(
        "o_orderkey",
        probed.o_custkey.alias("custkey"),
        "o_date",
        "version_at_order",
        F.col("valid_from").cast("string").alias("valid_from"),
        (F.col("cents") * (F.lit(100) + F.col("version_at_order")))
        .cast("long")
        .alias("tiered_centicents"),
    )


JOIN_POINT_IN_TIME_SQL = """
WITH versions AS (
  SELECT o_custkey, o_orderdate AS valid_from,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS version
  FROM orders
), probed AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_orderdate AS VARCHAR) AS o_date,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
           AS version_at_order,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT p.o_orderkey, p.o_custkey AS custkey, p.o_date, p.version_at_order,
       CAST(v.valid_from AS VARCHAR) AS valid_from,
       CAST(p.cents * (100 + p.version_at_order) AS BIGINT)
         AS tiered_centicents
FROM probed p JOIN versions v
  ON p.o_custkey = v.o_custkey AND p.version_at_order = v.version
"""


# --- log2 histogram -----------------------------------------------------------


def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of ⌊log2(cents)⌋ per event type — the exponential-bin
    telemetry histogram, with the bin index derived from the base-2
    string length (exact integers; float log2 of a value sitting on a
    bin edge can land either side depending on the libm)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    bin_idx = F.when(cents <= 0, F.lit(-1)).otherwise(
        F.length(F.conv(cents.cast("string"), 10, 2)) - 1
    )
    return (
        ev.select("event_type", bin_idx.cast("long").alias("bin_log2"))
        .groupBy("event_type", "bin_log2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


AGG_LOG2_HISTOGRAM_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
       CAST(CASE WHEN cents <= 0 THEN -1
                 ELSE length(bin(cents)) - 1 END AS BIGINT) AS bin_log2,
       CAST(count(*) AS BIGINT) AS n
FROM base GROUP BY 1, 2
"""


# --- exact inter-arrival median without collect -------------------------------


def event_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median of inter-event gaps (microseconds) per user,
    computed scale-safely: lag → gap, rank the gaps, pick the row
    whose rank is ⌊(n+1)/2⌋.  No per-group collect — a user with 10M
    events costs two window passes, not one driver-sized array."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (us - F.lag(us, 1).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("user_id").orderBy("gap_us")
    ranked = gaps.select(
        "user_id",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    return ranked.where(
        F.col("rk") == F.floor((F.col("n") + 1) / 2).cast("int")
    ).select(
        "user_id",
        F.col("gap_us").cast("long").alias("median_gap_us"),
        F.col("n").cast("long").alias("n_gaps"),
    )


EVENT_INTERARRIVAL_MEDIAN_SQL = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
), nn AS (
  SELECT user_id, gap_us,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_us) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT user_id, CAST(gap_us AS BIGINT) AS median_gap_us,
       CAST(n AS BIGINT) AS n_gaps
FROM nn WHERE rk = CAST(floor((n + 1) / 2) AS INTEGER)
"""


# --- Zipf slope ---------------------------------------------------------------

_ZIPF_TOPK = 1000


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares Zipf exponent per language over (ln rank, ln freq)
    of the top tokens.  Both logs are fixpointed to integer micro-nats
    per term BEFORE the regression sums (exact integer Σ), the slope is
    one double division rounded to 6 — the corpus-health statistic
    (natural text ≈ −1)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("tok"),
    )
    freqs = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).alias("freq")
    )
    wr = Window.partitionBy("lang").orderBy(
        F.col("freq").desc(), F.col("tok").asc()
    )
    # top-K ranks only: the standard Zipf-fit range, and it bounds the
    # Σx² / Σxy integer sums far below BIGINT overflow at any corpus
    # size (unbounded distinct-token counts would overflow at ~sf0.1)
    ranked = freqs.select(
        "lang",
        F.row_number().over(wr).alias("rank"),
        "freq",
    ).where(F.col("rank") <= _ZIPF_TOPK)
    x = F.floor(F.log(F.col("rank").cast("double")) * 1e6 + F.lit(0.5)).cast(
        "long"
    )
    y = F.floor(F.log(F.col("freq").cast("double")) * 1e6 + F.lit(0.5)).cast(
        "long"
    )
    pts = ranked.select("lang", x.alias("x"), y.alias("y"))
    agg = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    return agg.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        F.when(den > 0, F.round(num / den, 6)).alias("zipf_slope_r6"),
    )


TEXT_ZIPF_SLOPE_SQL = f"""
WITH toks AS (
  SELECT lang, t AS tok
  FROM (SELECT lang,
               unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\\s+'),
                 t -> t <> '')) AS t
        FROM documents)
), freqs AS (
  SELECT lang, tok, count(*) AS freq FROM toks GROUP BY lang, tok
), ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY freq DESC, tok ASC) AS rank,
         freq
  FROM freqs
), pts AS (
  SELECT lang,
         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM ranked WHERE rank <= {_ZIPF_TOPK}
), agg AS (
  SELECT lang, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n_tokens,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
       END AS zipf_slope_r6
FROM agg
"""


# --- local maxima -------------------------------------------------------------


def window_peak_local_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima per user series: cents greater than both the
    previous and next observation (series endpoints never qualify).
    One lag + one lead over a single user-keyed sort."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select("event_id", "user_id", "ts", cents.alias("cents"))
    prev, nxt = F.lag("cents", 1).over(w), F.lead("cents", 1).over(w)
    return base.select(
        "event_id",
        "user_id",
        "cents",
        # coalesce: a NULL cents (NULL value) makes the boolean chain
        # NULL in Spark, while SQL's CASE WHEN <NULL> THEN 1 ELSE 0
        # routes to 0 — a NULL observation is simply not a peak
        F.coalesce(
            (
                prev.isNotNull()
                & nxt.isNotNull()
                & (F.col("cents") > prev)
                & (F.col("cents") > nxt)
            ).cast("long"),
            F.lit(0),
        ).alias("is_peak"),
    )


WINDOW_PEAK_LOCAL_MAX_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts, event_id AS eid,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, cents,
       CAST(CASE WHEN lag(cents) OVER w IS NOT NULL
                  AND lead(cents) OVER w IS NOT NULL
                  AND cents > lag(cents) OVER w
                  AND cents > lead(cents) OVER w
                 THEN 1 ELSE 0 END AS BIGINT) AS is_peak
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), eid)
"""


QUERIES: dict[str, QuerySpec] = {
    "join_point_in_time": QuerySpec(
        join_point_in_time, JOIN_POINT_IN_TIME_SQL
    ),
    "agg_log2_histogram": QuerySpec(
        agg_log2_histogram, AGG_LOG2_HISTOGRAM_SQL
    ),
    "event_interarrival_median": QuerySpec(
        event_interarrival_median, EVENT_INTERARRIVAL_MEDIAN_SQL
    ),
    "text_zipf_slope": QuerySpec(text_zipf_slope, TEXT_ZIPF_SLOPE_SQL),
    "window_peak_local_max": QuerySpec(
        window_peak_local_max, WINDOW_PEAK_LOCAL_MAX_SQL
    ),
}
