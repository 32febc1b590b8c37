"""Round-5 batch 40 — sequence/cohort analytics staples:

* ``event_pattern_regex`` — CEP-lite sequence detection (the batch
  analog of MATCH_RECOGNIZE / Flink CEP): each user's event history is
  folded into an ordered single-char journey string and a regex finds
  the signup→view→purchase progression.  The encode step is one
  grouped aggregate; the match is a codegen'd rlike — no per-row
  Python, no state machine.
* ``event_rfm_scores`` — Recency/Frequency/Monetary quintile scoring
  over orders: the canonical CRM segmentation.  ntile(5) runs on the
  CUSTOMER-dimension aggregate (never the order fact), with total
  tiebreaks so quintile edges are deterministic cross-engine.
* ``agg_gini_concentration`` — Gini coefficient of customer spend per
  nation from the rank-sum identity
  ``G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)`` over ascending spend —
  exact integer arithmetic (cents × row_number) until one final
  double division, fixpointed to 1e-6.
* ``event_survival_km`` — Kaplan–Meier survival of time-to-first-
  purchase with right-censoring at the corpus horizon.  The life
  table (one row per distinct day) carries integer at-risk/event
  counts; ``S(t)`` is emitted as Σ micro-nat log terms — each
  ``ln(nᵢ−dᵢ)−ln(nᵢ)`` fixpointed BEFORE the cumulative sum, the
  text-surprisal discipline, so the running product is an exact
  integer cross-engine.
* ``str_ipv4_aggregate`` — dotted-quad parsing + /16 subnet rollup:
  the log-analytics staple.  IPs are synthesized deterministically
  from event ids (the fixture has no raw IPs), then PARSED BACK from
  the string form — split, octet casts, uint32 packing — so the
  string-parsing path is what the oracle checks.

Scale notes (100 TB bar): the only global windows here run over
dimension-sized frames — |customers| for RFM quintiles, |distinct
days| for the KM life table — never over the event/order fact. The
journey encode is a grouped collect bounded by per-user event counts
(at pipeline scale a sessionized window or applyInPandas automaton
replaces the unbounded group; documented, same contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- CEP-lite sequence pattern over journeys ----------------------------------

_FUNNEL_RE = "s.*v.*p"  # signup, then a view, then a purchase — in order


def event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered journey string (event-type initials, ts +
    event_id total order) matched against the signup→view→purchase
    regex.  Encode = one grouped aggregate with the sort INSIDE the
    collect (array_sort over (ts, event_id, ch) structs — event_id
    breaks ts ties, so the string is unique); match = rlike in
    whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    ch = F.substring("event_type", 1, 1)  # c/v/p/s/e — initials are distinct
    per = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", ch.alias("ch")))
                ),
                lambda s: s["ch"],
            ),
            "",
        ).alias("journey")
    )
    return per.select(
        "user_id",
        F.length("journey").cast("long").alias("journey_len"),
        F.col("journey").rlike(_FUNNEL_RE).cast("long").alias("funnel_matched"),
        (
            F.length("journey")
            - F.length(F.regexp_replace("journey", "p", ""))
        ).cast("long").alias("n_purchases"),
    )


EVENT_PATTERN_REGEX_SQL = f"""
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
)
SELECT user_id,
       CAST(length(journey) AS BIGINT) AS journey_len,
       CAST(CASE WHEN regexp_matches(journey, '{_FUNNEL_RE}')
                 THEN 1 ELSE 0 END AS BIGINT) AS funnel_matched,
       CAST(length(journey) - length(replace(journey, 'p', ''))
            AS BIGINT) AS n_purchases
FROM j
"""


# --- RFM quintile scoring ------------------------------------------------------


def event_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R/F/M quintiles per customer over orders.  Recency is days from
    the customer's last order to the corpus horizon (broadcast 1-row
    max); scores are ntile(5) with custkey tiebreaks — a total order,
    so the quintile boundaries are bit-stable cross-engine.  The
    windows run over the |customers|-row aggregate, not the fact."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    per = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    hz = per.agg(F.max("last_d").alias("horizon"))
    base = per.crossJoin(F.broadcast(hz)).select(
        "o_custkey",
        F.datediff("horizon", "last_d").cast("long").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    w_m = Window.orderBy(
        F.col("monetary_cents").desc(), F.col("o_custkey").asc()
    )
    scored = base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(w_r).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("long"),
    )


EVENT_RFM_SCORES_SQL = """
WITH per AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey
), base AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_d, (SELECT max(last_d) FROM per))
              AS BIGINT) AS recency_days,
         frequency, monetary_cents
  FROM per
), scored AS (
  SELECT o_custkey, recency_days, frequency, monetary_cents,
         CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
              AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
              AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
              AS BIGINT) AS m_score
  FROM base
)
SELECT *, CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
         AS rfm_code
FROM scored
"""


# --- Gini concentration --------------------------------------------------------


def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini of customer spend within each nation via the rank-sum
    identity over ascending spend (custkey tiebreak).  Everything is
    BIGINT (cents × rank) until the single final division; the result
    is fixpointed to 1e-6.  Degenerate nations (zero total spend)
    emit NULL — the corr-matrix zero-variance guard pattern.

    Scale: Σ i·xᵢ and the (n+1)·Σx cross terms are quadratic in
    customers-per-nation, so the rank-sum arithmetic runs in
    DECIMAL(38,0)/HUGEINT end-to-end (same plan, wider accumulator —
    widened in r8 by the int-product audit's Σ(a·b) extension; the old
    BIGINT form died past ~sf10)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    spend = orders.groupBy("o_custkey").agg(F.sum(cents).alias("x"))
    g = spend.join(
        cust.select(
            F.col("c_custkey").alias("o_custkey"), "c_nationkey"
        ),
        "o_custkey",
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("x").asc(), F.col("o_custkey").asc()
    )
    ranked = g.select(
        "c_nationkey", "x", F.row_number().over(w).cast("long").alias("i")
    )
    per = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("x")).alias("s1"),
        F.sum("x").alias("s0"),
    )
    num = (
        F.lit(2) * F.col("s1")
        - (F.col("n_cust") + 1).cast("decimal(38,0)") * F.col("s0")
    ).cast("double")
    den = (
        F.col("n_cust").cast("decimal(38,0)") * F.col("s0")
    ).cast("double")
    gini = F.when(
        F.col("s0") > 0,
        F.floor(num * F.lit(1e6) / den + F.lit(0.5)).cast("long"),
    )
    return per.select("c_nationkey", "n_cust", gini.alias("gini_r6fp"))


AGG_GINI_CONCENTRATION_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT c.c_nationkey, s.x,
         CAST(row_number() OVER (PARTITION BY c.c_nationkey
                                 ORDER BY s.x ASC, s.o_custkey ASC)
              AS BIGINT) AS i
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
), per AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_cust,
         sum(CAST(i AS HUGEINT) * x) AS s1,
         CAST(sum(x) AS BIGINT) AS s0
  FROM ranked GROUP BY c_nationkey
)
SELECT c_nationkey, n_cust,
       CASE WHEN s0 > 0 THEN
         CAST(floor(CAST(2 * s1 - (n_cust + 1) * CAST(s0 AS HUGEINT)
                         AS DOUBLE) * 1e6
                    / CAST(n_cust * CAST(s0 AS HUGEINT) AS DOUBLE)
                    + 0.5) AS BIGINT)
       END AS gini_r6fp
FROM per
"""


# --- Kaplan-Meier survival -----------------------------------------------------


def event_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-first-purchase survival curve with right-censoring at
    the corpus horizon.  Life table: one row per distinct day t with
    at_risk nₜ, events dₜ, censored cₜ; ``S(t)`` is carried as
    ``surv_unats = Σ_{s≤t} round((ln(nₛ−dₛ) − ln(nₛ))·1e6)`` — each
    log term fixpointed BEFORE the cumulative sum (the surprisal
    discipline) so the running product is integer-exact cross-engine.
    Days where the risk set extinguishes (n == d) emit NULL.

    The cumulative windows run over the |distinct days| life table —
    bounded by the observation horizon, never corpus-sized."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("dp"),
    )
    hz = ev.agg(F.max(F.to_date("ts")).alias("h"))
    users = per.crossJoin(F.broadcast(hz)).select(
        F.when(
            F.col("dp").isNotNull(), F.datediff("dp", "d0")
        ).otherwise(F.datediff("h", "d0")).cast("long").alias("t"),
        F.when(F.col("dp").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_event"),
    )
    life = users.groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("is_event")).cast("long").alias("c"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = life.agg(F.sum(F.col("d") + F.col("c")).alias("tot"))
    at_risk = (
        F.col("tot")
        - F.sum(F.col("d") + F.col("c")).over(w_all)
        + F.col("d")
        + F.col("c")
    ).cast("long")
    lt = (
        life.crossJoin(F.broadcast(total))
        .withColumn("at_risk", at_risk)
        .drop("tot")
    )
    term = F.when(
        (F.col("d") > 0) & (F.col("at_risk") > F.col("d")),
        F.floor(
            (
                F.log((F.col("at_risk") - F.col("d")).cast("double"))
                - F.log(F.col("at_risk").cast("double"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    )
    cum = F.sum(term).over(w_all)  # sum skips NULL terms in both engines
    surv = F.when(F.col("at_risk") > F.col("d"), cum)
    return (
        lt.withColumn("term", term)
        .select(
            "t",
            "at_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            surv.alias("surv_unats"),
        )
    )


EVENT_SURVIVAL_KM_SQL = """
WITH per AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS d0,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(ts AS DATE) END) AS dp
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
), users AS (
  SELECT CAST(CASE WHEN dp IS NOT NULL
              THEN date_diff('day', d0, dp)
              ELSE date_diff('day', d0,
                             (SELECT max(CAST(ts AS DATE)) FROM events
                              WHERE ts IS NOT NULL)) END AS BIGINT) AS t,
         CAST(CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_event
  FROM per
), life AS (
  SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c
  FROM users GROUP BY t
), lt AS (
  SELECT t, d, c,
         CAST((SELECT sum(d + c) FROM life)
              - sum(d + c) OVER (ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
              + d + c AS BIGINT) AS at_risk
  FROM life
), terms AS (
  SELECT *,
         CASE WHEN d > 0 AND at_risk > d THEN
           CAST(floor((ln(CAST(at_risk - d AS DOUBLE))
                       - ln(CAST(at_risk AS DOUBLE))) * 1e6 + 0.5)
                AS BIGINT)
         END AS term
  FROM lt
)
SELECT t, at_risk, d AS n_events, c AS n_censored,
       CASE WHEN at_risk > d THEN
         CAST(sum(term) OVER (ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT)
       END AS surv_unats
FROM terms
"""


# --- IPv4 parse + subnet rollup --------------------------------------------------


def str_ipv4_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-quad parse → uint32 pack → /16 subnet rollup.  The IPs
    are synthesized from event ids (two deterministic octet formulas →
    two /8 networks), then the STRING is parsed back — split, octet
    casts, shift-free multiply-add packing — which is the path a log
    pipeline runs at scale.  All expression-level codegen; the rollup
    is one map-side-combinable aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    a = (F.lit(10) + (F.col("event_id") % 2) * 162).cast("long")
    b = (F.col("user_id") % 256).cast("long")
    c = (F.floor(F.col("event_id") / 256) % 256).cast("long")
    d = (F.col("event_id") % 256).cast("long")
    ip = F.concat_ws(".", a, b, c, d)
    parsed = ev.select(ip.alias("ip_str"))
    oct_ = F.split(F.col("ip_str"), r"\.")
    o = [F.get(oct_, i).cast("long") for i in range(4)]
    packed = (
        o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3]
    ).alias("ip32")
    sub = F.concat_ws(
        ".", o[0], o[1], F.lit("0"), F.lit("0")
    ).alias("subnet16")
    return (
        parsed.select(sub, packed)
        .groupBy("subnet16")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_requests"),
            F.countDistinct("ip32").cast("long").alias("n_hosts"),
            F.min("ip32").cast("long").alias("min_ip32"),
            F.max("ip32").cast("long").alias("max_ip32"),
        )
    )


STR_IPV4_AGGREGATE_SQL = """
WITH synth AS (
  SELECT concat_ws('.',
           CAST(10 + (event_id % 2) * 162 AS BIGINT),
           CAST(user_id % 256 AS BIGINT),
           CAST(floor(event_id / 256) % 256 AS BIGINT),
           CAST(event_id % 256 AS BIGINT)) AS ip_str
  FROM events
), parsed AS (
  SELECT concat_ws('.', string_split(ip_str, '.')[1],
                        string_split(ip_str, '.')[2], '0', '0')
           AS subnet16,
         CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip32
  FROM synth
)
SELECT subnet16,
       CAST(count(*) AS BIGINT) AS n_requests,
       CAST(count(DISTINCT ip32) AS BIGINT) AS n_hosts,
       CAST(min(ip32) AS BIGINT) AS min_ip32,
       CAST(max(ip32) AS BIGINT) AS max_ip32
FROM parsed
GROUP BY subnet16
"""


QUERIES: dict[str, QuerySpec] = {
    "event_pattern_regex": QuerySpec(
        event_pattern_regex, EVENT_PATTERN_REGEX_SQL
    ),
    "event_rfm_scores": QuerySpec(event_rfm_scores, EVENT_RFM_SCORES_SQL),
    "agg_gini_concentration": QuerySpec(
        agg_gini_concentration, AGG_GINI_CONCENTRATION_SQL
    ),
    "event_survival_km": QuerySpec(event_survival_km, EVENT_SURVIVAL_KM_SQL),
    "str_ipv4_aggregate": QuerySpec(
        str_ipv4_aggregate, STR_IPV4_AGGREGATE_SQL
    ),
}
