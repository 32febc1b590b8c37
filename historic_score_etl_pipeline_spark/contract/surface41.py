"""Round-6 batch 48 — retrieval, corpus tooling, and resampling
staples:

* ``text_bm25_score`` — integerized BM25 (k1 = 1.2, b = 0.75) of every
  document against a fixed 3-term query.  idf is the standard
  ln((2N−2df+1)/(2df+1)) fixpointed to micro-nats (integer-ratio arg);
  the tf normalization is EXACT integer arithmetic after scaling by
  the floor-divided average doc length:
  term = idf_fp·22·avgdl·tf div (10·avgdl·tf + 3·avgdl + 9·dl) — all
  BIGINT-bounded regardless of corpus size (avgdl ≤ max dl, not Σdl).
* ``text_kwic_context`` — keyword-in-context: every occurrence of the
  keyword with 3 tokens of left/right context — the concordance tool
  corpus linguists (and prompt-leak hunters) run.
* ``text_inverted_postings`` — inverted-index summary per token with
  df ≥ 5: document frequency, total tf, and the top document by
  (tf desc, doc_id asc) — the retrieval-index build step as a query.
* ``sample_poisson_bootstrap`` — one deterministic Poisson(1)
  bootstrap replicate: the md5-uniform of each event id is inverted
  through the Poisson CDF via PRECOMPUTED integer thresholds on the
  2⁶⁰ scale (the float CDF never evaluated in-engine), yielding
  replicate weights 0..5 — the bagging/CI machinery of a training
  pipeline, exactly replayable.
* ``event_order_gap_stats`` — successive-order gaps per customer
  (lead over order date): n, min/max and the LOWER-median gap by
  order statistic (rank selection, never interpolation).

Scale notes: BM25's per-term df table and the two corpus scalars are
broadcast 1-row/|terms|-row folds (ARCHITECTURE.md §scalar folding
rule); KWIC and postings explode tokens once and aggregate
map-side; bootstrap weights are a pure scan-side projection; the gap
stats window and aggregate share the custkey partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.operators.pins import pin
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- integerized BM25 -------------------------------------------------------------

_BM25_TERMS = ("spark", "query", "table")


def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 of each doc against the fixed query, exact integer
    arithmetic after micro-nat idf fixpoints and an avgdl floor."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    # dl is a pure PROJECTION, not an explode+groupBy (r12): the doc
    # length is the size of the filtered token array, so the old corpus
    # explode + |docs|-row hash shuffle for dl disappears entirely —
    # one scan-side map emits (doc_id, dl) directly.  The `dl > 0`
    # filter reproduces the old explode semantics exactly (a doc with
    # no non-empty tokens produced no dl row; size(NULL array) = -1
    # likewise drops NULL text).  Pinned because dl still feeds scal
    # AND the score join (r11's divergent-pushed-filter disease).
    # Measured with the tf pin below: bm25 1.36 → 1.05 s min-of-6
    # interleaved at sf0.1, rows identical.
    dl_arr = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != ""
    )
    dl = pin(
        docs.select("doc_id", F.size(dl_arr).alias("dl")).where(
            F.col("dl") > 0
        )
    )
    # corpus scalars: N docs, avgdl = floor(total_tokens / N)
    scal = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).select("n_docs", F.expr("total_dl div n_docs").alias("avgdl"))
    hits = toks.where(F.col("tok").isin(*_BM25_TERMS))
    tf = pin(hits.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    ))
    # df from tf, not from a second distinct pass over hits: tf's rows ARE
    # the distinct (doc_id, tok) pairs, so count(*) per tok is identical —
    # and the old shape's distinct exchange canonicalized differently from
    # tf's aggregate exchange, so the corpus explode ran twice (r11 plan
    # audit; one fewer scan+Generate pass, rows identical).
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    base = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
    )
    idf_fp = F.floor(
        F.log(
            (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double")
            / (2 * F.col("df") + 1).cast("double")
        )
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    term = F.expr(
        "(idf_fp * 22 * avgdl * tf) div "
        "(10 * avgdl * tf + 3 * avgdl + 9 * dl)"
    )
    scored = base.withColumn("idf_fp", idf_fp).withColumn("term_fp", term)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.sum("tf").cast("long").alias("tf_total"),
        F.sum("term_fp").cast("long").alias("bm25_fp"),
    )


TEXT_BM25_SCORE_SQL = f"""
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM (SELECT doc_id,
               unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS t
        FROM documents)
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), scal AS (
  SELECT count(*) AS n_docs, sum(dl) // count(*) AS avgdl FROM dl
), hits AS (
  SELECT doc_id, tok FROM toks
  WHERE tok IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM hits GROUP BY doc_id, tok
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM hits GROUP BY tok
), base AS (
  SELECT t.doc_id, t.tf, d.df, l.dl, s.n_docs, s.avgdl,
         CAST(floor(ln(CAST(2*s.n_docs - 2*d.df + 1 AS DOUBLE)
                        / CAST(2*d.df + 1 AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT) AS idf_fp
  FROM tf t JOIN dfreq d ON t.tok = d.tok
  JOIN dl l ON t.doc_id = l.doc_id
  CROSS JOIN scal s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_terms_hit,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       CAST(sum((idf_fp * 22 * avgdl * tf)
                // (10 * avgdl * tf + 3 * avgdl + 9 * dl)) AS BIGINT)
         AS bm25_fp
FROM base GROUP BY doc_id
"""


# --- keyword in context --------------------------------------------------------------

_KWIC_WORD = "spark"


def text_kwic_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every occurrence of the keyword with ≤3 tokens of context each
    side (0-based position; contexts clipped at doc bounds)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks")
    ).select("doc_id", "toks", F.posexplode("toks").alias("pos0", "tok"))
    hits = base.where(F.col("tok") == _KWIC_WORD)
    lstart = F.greatest(F.col("pos0") - 3, F.lit(0))
    left = F.slice(F.col("toks"), lstart + 1, F.col("pos0") - lstart)
    right = F.slice(F.col("toks"), F.col("pos0") + 2, 3)
    return hits.select(
        "doc_id",
        F.col("pos0").cast("long").alias("pos0"),
        F.concat_ws(" ", left).alias("left_ctx"),
        F.concat_ws(" ", right).alias("right_ctx"),
    )


TEXT_KWIC_CONTEXT_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), pos AS (
  SELECT doc_id, toks, i - 1 AS pos0
  FROM t, unnest(generate_series(1, len(toks))) AS u(i)
  WHERE toks[i] = '{_KWIC_WORD}'
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(pos0 AS BIGINT) AS pos0,
       coalesce(array_to_string(toks[greatest(pos0 - 3, 0) + 1 : pos0],
                                ' '), '') AS left_ctx,
       coalesce(array_to_string(toks[pos0 + 2 : pos0 + 4], ' '), '')
         AS right_ctx
FROM pos
"""


# --- inverted postings ----------------------------------------------------------------

_POSTINGS_MIN_DF = 5


def text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per token with df ≥ 5: document frequency, total tf, top doc by
    (tf desc, doc_id asc) — the index-build summary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    # max_by needs a TOTAL order: pack (tf, -doc_id) into one sortable
    # long so ties break toward the smaller doc_id
    packed = F.col("tf") * F.lit(1_000_000_000) - F.col("doc_id")
    agg = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
        F.max_by("doc_id", packed).cast("long").alias("top_doc"),
        F.max("tf").cast("long").alias("top_tf"),
    )
    return agg.where(F.col("df") >= _POSTINGS_MIN_DF)


TEXT_INVERTED_POSTINGS_SQL = f"""
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM (SELECT doc_id,
               unnest(list_filter(
                 string_split_regex(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS t
        FROM documents)
), tf AS (
  SELECT tok, doc_id, count(*) AS tf FROM toks GROUP BY tok, doc_id
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       CAST(max_by(doc_id, tf * 1000000000 - doc_id) AS BIGINT) AS top_doc,
       CAST(max(tf) AS BIGINT) AS top_tf
FROM tf GROUP BY tok
HAVING count(*) >= {_POSTINGS_MIN_DF}
"""


# --- deterministic Poisson bootstrap -----------------------------------------------

# Poisson(1) CDF inverted through integer thresholds on the 2^60 scale
# (floor(cdf_k * 2^60), k = 0..4; u >= T4 clamps to weight 5).  The
# float CDF is evaluated ONCE here, not per row per engine.
_POIS_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)


def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Poisson(1) bootstrap replicate over events: md5-uniform per
    event id → integer-threshold inverse CDF → weight 0..5; the
    replicate's per-type weighted count and cents tally."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("boot1:"), F.col("event_id"))), 1, 15),
        16,
        10,
    ).cast("long")
    w = (
        F.when(u < _POIS_T[0], 0)
        .when(u < _POIS_T[1], 1)
        .when(u < _POIS_T[2], 2)
        .when(u < _POIS_T[3], 3)
        .when(u < _POIS_T[4], 4)
        .otherwise(5)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select("event_type", w.alias("w"), cents.alias("cents"))
    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("long").alias("boot_n"),
        # Σw·cents grows ~5·avg_cents per row — sum in DECIMAL(38,0)/
        # HUGEINT, emit BIGINT via try_cast on both engines (r8 audit)
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("cents"))
        .try_cast("long")
        .alias("boot_cents"),
    )


SAMPLE_POISSON_BOOTSTRAP_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(('0x' || substr(md5('boot1:' || CAST(event_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS u,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
), wts AS (
  SELECT event_type, cents,
         CASE WHEN u < {_POIS_T[0]} THEN 0
              WHEN u < {_POIS_T[1]} THEN 1
              WHEN u < {_POIS_T[2]} THEN 2
              WHEN u < {_POIS_T[3]} THEN 3
              WHEN u < {_POIS_T[4]} THEN 4
              ELSE 5 END AS w
  FROM base
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(w) AS BIGINT) AS boot_n,
       TRY_CAST(sum(CAST(w AS HUGEINT) * cents) AS BIGINT) AS boot_cents
FROM wts GROUP BY event_type
"""


# --- successive-order gap stats -------------------------------------------------------


def event_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer with ≥2 orders: successive-order gaps in days
    (lead over order date, orderkey tiebreak), min/max and LOWER-median
    gap by rank selection."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("nxt", F.lead("d").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff("nxt", "d").cast("long").alias("gap"),
        )
    )
    wg = Window.partitionBy("o_custkey").orderBy("gap", "o_orderkey")
    wn = Window.partitionBy("o_custkey")
    ranked = gaps.select(
        "o_custkey",
        "gap",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("o_custkey").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap")))
        .cast("long")
        .alias("median_gap"),
    )


EVENT_ORDER_GAP_STATS_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders
), gaps AS (
  SELECT o_custkey, o_orderkey,
         CAST(lead(d) OVER (PARTITION BY o_custkey
                            ORDER BY d, o_orderkey) - d AS BIGINT) AS gap
  FROM o
), g AS (
  SELECT o_custkey, gap FROM gaps WHERE gap IS NOT NULL
), ranked AS (
  SELECT o_custkey, gap,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY gap, o_custkey) AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS n
  FROM g
)
SELECT o_custkey,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap,
       CAST(max(gap) AS BIGINT) AS max_gap,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
         AS median_gap
FROM ranked GROUP BY o_custkey
"""


QUERIES: dict[str, QuerySpec] = {
    "text_bm25_score": QuerySpec(text_bm25_score, TEXT_BM25_SCORE_SQL),
    "text_kwic_context": QuerySpec(text_kwic_context, TEXT_KWIC_CONTEXT_SQL),
    "text_inverted_postings": QuerySpec(
        text_inverted_postings, TEXT_INVERTED_POSTINGS_SQL
    ),
    "sample_poisson_bootstrap": QuerySpec(
        sample_poisson_bootstrap, SAMPLE_POISSON_BOOTSTRAP_SQL
    ),
    "event_order_gap_stats": QuerySpec(
        event_order_gap_stats, EVENT_ORDER_GAP_STATS_SQL
    ),
}
