"""Round-4 batch 29 — the last uncovered reference transform plus nine
warehouse/curation staples, each with a DuckDB oracle twin:

* ``parse_token_records_h2h`` — the reference's HEAD-TO-HEAD token
  parser (app/team_utilities.py:113-123): tokens fill six fields
  round-robin, then the stream skips garbage until the first token of
  length > 3, which OPENS the next record as its date (``count_1 = 1``)
  — unlike the sibling parser at :76-88 (``parse_token_records``) whose
  reset token is discarded.  Restated as a per-document expression fold
  (no stateful UDF, no shuffle): record openers are a greedy
  min-spacing-6 selection over the token array, computed by
  ``F.aggregate``; fields are array slices.
* ``agg_countmin_sketch`` — mergeable Count-Min frequency sketch
  (Cormode & Muthukrishnan 2005) over document tokens: d=4 md5-seeded
  hash rows × w=64 buckets.  The OUTPUT is the sketch table itself —
  the structure a 1000-executor job merges by cell-wise sum;
  ``est(tok) = min_j cell[j][h_j(tok)]`` (over-count-only bound is
  pytest-asserted).
* ``event_markov_transitions`` — first-order transition counts +
  probabilities over per-user event streams (lead window), the
  path-analysis primitive.
* ``anomaly_mad_robust`` — median/MAD outlier flags (robust z-score):
  two tiny per-user aggregates broadcast back onto events; unlike
  mean/stddev, one whale row cannot drag the threshold.
* ``scan_rowgroup_prune`` — data-skipping ingest: lineitem staged
  range-partitioned + sorted by ship date so parquet row-group min/max
  stats line up with the filter; the read applies a pushed-down date
  range (plan-asserted PushedFilters).  The 100 TB story: a sorted
  layout turns a year-filter into reading ~1/7 of the row groups.
* ``window_gap_islands`` — gaps-and-islands (consecutive active days
  per user) via the date-minus-row_number anchor; per-user island
  stats, no self-join.
* ``dedup_latest_snapshot`` — latest record per (user, event_type) with
  a total-order tiebreak: THE warehouse dedup for CDC/event upserts.
* ``sample_train_test_split`` — deterministic 80/10/10 train/valid/test
  assignment from md5(doc_id): no RNG state, stable under reruns,
  retries, and repartitioning — the split every training-data pipeline
  needs to be reproducible.
* ``window_pareto_share`` — cumulative corpus-mass share per language
  (coverage curve): integer char sums so the top-80% flag is exact.
* ``scan_schema_evolution`` — mergeSchema read over two parquet
  generations (a column added mid-stream), nulls for pre-evolution
  rows: schema drift is a fact of life in any long-lived 100 TB lake.

Determinism rules (engine-build conventions): integer aggregates CAST
to BIGINT in the oracle; ratios = round(exact_int / exact_int, 6);
md5 for every sampled/hashed decision; every window totally ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- H2H restart-on-date-token parser ----------------------------------------

_H2H_MAX_TOKS = 48  # declared prefix, same spirit as parse_token_records' 12


def h2h_parse(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Reference semantics (app/team_utilities.py:113-123): consume six
    tokens round-robin into (date, league, home, away, home_goal,
    away_goal); once a record is full, SKIP tokens until one of length
    > 3 — that token is consumed as the NEXT record's date.  The first
    token always opens record 0 (``count_1 = 0`` consumes
    unconditionally).  Unlike the sibling parser at :76-88, the
    boundary token IS the new record's first field — the sibling
    discards its reset token.

    Spark-first restatement: openers are a greedy selection over the
    token array — position 0, then repeatedly the first position
    ≥ prev+6 whose token has length > 3.  That fold is an expression-
    level ``F.aggregate`` (JVM codegen, constant-bounded by the 48-token
    cap), records are ``slice``s, output is one ``explode`` — zero
    shuffles, zero Python, fully parallel over documents."""
    arr = F.slice(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""),
        1,
        _H2H_MAX_TOKS,
    )
    staged = df.select(id_col, arr.alias("arr")).where(F.size("arr") > 0)
    indexed = F.transform(
        F.col("arr"), lambda x, i: F.struct(i.alias("pos"), x.alias("tok"))
    )
    openers = F.aggregate(
        indexed,
        F.array().cast("array<int>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(x["pos"]))
        .when(
            (x["pos"] >= F.element_at(acc, F.size(acc)) + F.lit(6))
            & (F.length(x["tok"]) > 3),
            F.concat(acc, F.array(x["pos"])),
        )
        .otherwise(acc),
    )
    recs = F.transform(
        openers,
        lambda s, k: F.struct(
            k.cast("long").alias("rec"),
            F.slice(F.col("arr"), s + 1, 6).alias("fields"),
        ),
    )
    return staged.select(id_col, F.explode(recs).alias("r")).select(
        id_col,
        F.col("r.rec").alias("rec"),
        *[F.get(F.col("r.fields"), i).alias(f"c{i}") for i in range(6)],
    )


def parse_token_records_h2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The H2H parser over the documents fixture — see ``h2h_parse``."""
    return h2h_parse(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


PARSE_TOKEN_RECORDS_H2H_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_slice(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> ''), 1, {_H2H_MAX_TOKS}) AS arr
  FROM documents
), lim AS (
  SELECT doc_id, arr FROM toks WHERE len(arr) > 0
), positioned AS (
  SELECT doc_id, g.i - 1 AS pos, arr[g.i] AS tok
  FROM lim, UNNEST(generate_series(1, len(arr))) AS g(i)
), openers AS (
  SELECT doc_id, 0 AS pos, CAST(0 AS BIGINT) AS rec FROM lim
  UNION ALL
  SELECT o.doc_id,
         (SELECT min(p.pos) FROM positioned p
           WHERE p.doc_id = o.doc_id AND p.pos >= o.pos + 6
             AND length(p.tok) > 3),
         o.rec + 1
  FROM openers o
  WHERE EXISTS (SELECT 1 FROM positioned p
                 WHERE p.doc_id = o.doc_id AND p.pos >= o.pos + 6
                   AND length(p.tok) > 3)
)
SELECT r.doc_id, r.rec,
       max(CASE WHEN p.pos = r.pos     THEN p.tok END) AS c0,
       max(CASE WHEN p.pos = r.pos + 1 THEN p.tok END) AS c1,
       max(CASE WHEN p.pos = r.pos + 2 THEN p.tok END) AS c2,
       max(CASE WHEN p.pos = r.pos + 3 THEN p.tok END) AS c3,
       max(CASE WHEN p.pos = r.pos + 4 THEN p.tok END) AS c4,
       max(CASE WHEN p.pos = r.pos + 5 THEN p.tok END) AS c5
FROM openers r
JOIN positioned p
  ON p.doc_id = r.doc_id AND p.pos BETWEEN r.pos AND r.pos + 5
GROUP BY r.doc_id, r.rec
"""


# --- Count-Min sketch ---------------------------------------------------------

_CM_DEPTH = 4
_CM_WIDTH = 64


def _cm_bucket(j_col, tok_col):
    """md5-seeded row-j bucket — engine-portable (no native hash)."""
    seeded = F.concat(
        F.lit("cm"), j_col.cast("string"), F.lit(":"), tok_col
    )
    return (
        F.conv(F.substring(F.md5(seeded), 1, 4), 16, 10).cast("long")
        % F.lit(_CM_WIDTH)
    )


def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch of document-token frequencies: the output IS the
    d×w cell table (j, bucket, n) — a constant-size (256-row) mergeable
    summary.  Point estimate = min over the d rows of cell[h_j(tok)],
    never an undercount (pytest-asserted).

    Scale shape: explode → 4 sketch rows per token → ONE map-side-
    combined shuffle whose reduce side is ≤ d·w rows regardless of
    corpus size.  This is the sketch a 1000-executor fleet merges by
    cell-wise sum — cardinality-proof where an exact token count
    shuffles the whole vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("tok")
    )
    rows = toks.select(
        "tok",
        F.explode(
            F.array(*[F.lit(j) for j in range(_CM_DEPTH)])
        ).alias("j"),
    )
    return (
        rows.select("j", _cm_bucket(F.col("j"), F.col("tok")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


AGG_COUNTMIN_SKETCH_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents
), rows_ AS (
  SELECT tok, j FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) d(j)
)
SELECT j,
       CAST(('0x' || substr(md5('cm' || j || ':' || tok), 1, 4)) AS BIGINT)
         % {_CM_WIDTH} AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM rows_
GROUP BY j, bucket
"""


# --- first-order Markov transitions ------------------------------------------


def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event streams → global (src → dst) transition counts and
    probabilities: the path/attribution primitive (what follows a click?).
    One shuffle on user_id for the lead window; the (src, dst) aggregate
    is |types|² rows — map-side combined, reduce side is tiny.  p_r6 =
    round(n / n_from_src, 6): a ratio of exact BIGINTs, identical bits
    in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counted = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_src = Window.partitionBy("src")
    return counted.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_src).cast("double"),
            6,
        ).alias("p_r6"),
    )


EVENT_MARKOV_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS dst
  FROM events
), counted AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE dst IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p_r6
FROM counted
"""


# --- robust MAD outlier flags -------------------------------------------------

_MAD_K = 3


def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier flags per user: |x − median| > 3·MAD.  Robust
    where mean/stddev is not — one whale event cannot drag the
    threshold (the classic z-score failure this complements,
    anomaly_zscore_rolling).

    Scale shape: two per-user aggregates (|users| rows each) broadcast
    back onto events — the fact table is scanned twice but never
    re-shuffled by a window; both joins are broadcast, plan stays
    exchange-light.  Values are FIXPOINTED to integer cents BEFORE the
    median (ADVICE r4): a median of integers is either exact or a .5
    midpoint — both bit-stable doubles — so the two engines'
    independently-implemented interpolation cannot diverge by an ulp
    and flip a boundary row's flag."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    med = ev.groupBy("user_id").agg(F.median("cents").alias("med"))
    dev = ev.join(F.broadcast(med), "user_id")
    mad = dev.groupBy("user_id").agg(
        F.median(F.abs(F.col("cents") - F.col("med"))).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "user_id")
        .select(
            "event_id",
            "user_id",
            # coalesce: NULL cents (NULL value) must flag 0, matching
            # SQL's CASE WHEN <NULL> THEN 1 ELSE 0 — not propagate NULL
            F.coalesce(
                (
                    F.abs(F.col("cents") - F.col("med"))
                    > F.lit(_MAD_K) * F.col("mad")
                ).cast("long"),
                F.lit(0),
            ).alias("is_outlier"),
        )
    )


ANOMALY_MAD_ROBUST_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), med AS (
  SELECT user_id, median(cents) AS med FROM ev GROUP BY user_id
), dev AS (
  SELECT e.event_id, e.user_id, e.cents, m.med
  FROM ev e JOIN med m USING (user_id)
), mad AS (
  SELECT user_id, median(abs(cents - med)) AS mad FROM dev GROUP BY user_id
)
SELECT d.event_id, d.user_id,
       CAST(CASE WHEN abs(d.cents - d.med) > {_MAD_K} * m.mad
                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM dev d JOIN mad m USING (user_id)
"""


# --- sorted-layout row-group pruning scan ------------------------------------

_PRUNE_LO = "1996-01-01"
_PRUNE_HI = "1997-01-01"


def _staged_sorted_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Stage lineitem range-partitioned + sorted by l_shipdate — the
    clustered layout whose parquet row-group min/max stats make a date
    filter skip whole row groups (zone maps / data skipping).  At 100 TB
    this layout decision is the difference between scanning 100 TB and
    scanning the one year you asked for."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "sortedli", sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag",
        "l_extendedprice", "l_discount",
    )
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


_SORTED_LI_SCHEMA = (
    "l_orderkey long, l_shipdate timestamp_ntz, l_returnflag string, "
    "l_extendedprice double, l_discount double"
)


def scan_rowgroup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the ship-date-sorted staging back with a one-year predicate
    and aggregate revenue per return flag.  The filter reaches the scan
    (PushedFilters, plan-asserted in tests) so parquet prunes row groups
    by min/max — the oracle runs the same year over the ORIGINAL table,
    proving the sorted round-trip loses nothing.

    Session-proofing: the read declares an explicit NTZ schema (the
    driver brings its own session — inference would flip LTZ/NTZ with
    ``spark.sql.timestampType``) and the bounds are DATE literals, the
    TZ-free idiom every ship-date filter in the TPC-H suite uses."""
    path = _staged_sorted_lineitem(spark, sf_dir)
    li = spark.read.schema(_SORTED_LI_SCHEMA).parquet(path)
    lo = F.lit(_PRUNE_LO).cast("date")
    hi = F.lit(_PRUNE_HI).cast("date")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        )
    )


SCAN_ROWGROUP_PRUNE_SQL = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '{_PRUNE_LO}'
  AND l_shipdate <  DATE '{_PRUNE_HI}'
GROUP BY l_returnflag
"""


# --- gaps and islands ---------------------------------------------------------


def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day islands per user via the classic
    date − row_number anchor (equal anchor ⇔ consecutive run) — no
    self-join, no recursion.  Distinct (user, day) first, then one
    window + two cheap aggregates, all partitioned by user: a single
    shuffle chain that scales with |users|·|days|, never events²."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


WINDOW_GAP_ISLANDS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), anchored AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM days
), islands AS (
  SELECT user_id, anchor, count(*) AS len
  FROM anchored GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS active_days
FROM islands GROUP BY user_id
"""


# --- latest-snapshot dedup ----------------------------------------------------


def dedup_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per (user, event_type) — the CDC/upsert dedup every
    warehouse runs hourly.  row_number over (ts DESC, event_id DESC)
    with a total-order tiebreak, keep rank 1: one shuffle on the key,
    and Spark's WindowGroupLimit pushes the rank-1 predicate into the
    sort so per-key state is one row, not the full history."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id", "event_type",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("value").alias("last_value"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


DEDUP_LATEST_SNAPSHOT_SQL = """
SELECT user_id, event_type, last_ts_us, last_value
FROM (
  SELECT user_id, event_type, epoch_us(ts) AS last_ts_us,
         value AS last_value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- deterministic train/valid/test split ------------------------------------

_SPLIT_SEED = "split:"


def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment from
    ``md5('split:' || doc_id) mod 100`` — no RNG state, so the split is
    identical across engines, reruns, retries, and any repartitioning:
    the reproducibility property a training pipeline cannot live
    without.  Pure scan-side projection — zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_SPLIT_SEED), F.col("doc_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(h < 80, F.lit("train"))
        .when(h < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


SAMPLE_TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN h < 80 THEN 'train'
            WHEN h < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('{_SPLIT_SEED}' || CAST(doc_id AS VARCHAR)),
                              1, 4)) AS BIGINT) % 100 AS h
  FROM documents
)
"""


# --- Pareto / coverage share --------------------------------------------------


def window_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus-mass coverage per language: docs ordered by
    size desc, running char sum, and an exact integer top-80%-of-mass
    flag (cum·5 ≤ total·4 — no float ratio, no rounding surface).  The
    curation question this answers: how few documents carry 80% of the
    corpus?  One shuffle on lang; both windows share the partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    w_tot = Window.partitionBy("lang")
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.sum("n_chars").over(w_cum).cast("long").alias("cum_chars"),
        (
            F.sum("n_chars").over(w_cum) * 5
            <= F.sum("n_chars").over(w_tot) * 4
        )
        .cast("long")
        .alias("in_top80"),
    )


WINDOW_PARETO_SHARE_SQL = """
WITH c AS (
  SELECT doc_id, lang,
         sum(n_chars) OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_chars,
         sum(n_chars) OVER (PARTITION BY lang) AS tot_chars
  FROM documents
)
SELECT doc_id, lang, CAST(cum_chars AS BIGINT) AS cum_chars,
       CAST(CASE WHEN cum_chars * 5 <= tot_chars * 4 THEN 1 ELSE 0 END
            AS BIGINT) AS in_top80
FROM c
"""


# --- schema-evolution merge read ----------------------------------------------


def _staged_evolved_orders(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet generations under one root: gen1 (even keys) was
    written before ``o_orderpriority`` existed; gen2 (odd keys) carries
    it.  Exactly how a long-lived lake looks after a schema migration."""
    from historic_score_etl_pipeline_spark.contract._staging import (
        app_scoped_dir,
    )

    out = app_scoped_dir(spark, "evolve", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    gen1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    gen2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    gen1.write.mode("overwrite").parquet(f"{out}/gen=1")
    gen2.write.mode("overwrite").parquet(f"{out}/gen=2")
    return out


def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mergeSchema`` read across both generations — pre-evolution rows
    surface NULL for the added column (bucketed here under '(legacy)').
    mergeSchema is a footer-union at planning time, not a data rewrite:
    the 100 TB lake keeps its old files byte-identical.  The oracle
    rebuilds the same union from the original table, so the hash match
    proves no rows were dropped or mis-defaulted across generations."""
    path = _staged_evolved_orders(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("(legacy)")).alias("prio")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SCAN_SCHEMA_EVOLUTION_SQL = """
WITH merged AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT coalesce(o_orderpriority, '(legacy)') AS prio,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY prio
"""


QUERIES: dict[str, QuerySpec] = {
    "parse_token_records_h2h": QuerySpec(
        parse_token_records_h2h, PARSE_TOKEN_RECORDS_H2H_SQL
    ),
    "agg_countmin_sketch": QuerySpec(
        agg_countmin_sketch, AGG_COUNTMIN_SKETCH_SQL
    ),
    "event_markov_transitions": QuerySpec(
        event_markov_transitions, EVENT_MARKOV_TRANSITIONS_SQL
    ),
    "anomaly_mad_robust": QuerySpec(anomaly_mad_robust, ANOMALY_MAD_ROBUST_SQL),
    "scan_rowgroup_prune": QuerySpec(
        scan_rowgroup_prune, SCAN_ROWGROUP_PRUNE_SQL
    ),
    "window_gap_islands": QuerySpec(window_gap_islands, WINDOW_GAP_ISLANDS_SQL),
    "dedup_latest_snapshot": QuerySpec(
        dedup_latest_snapshot, DEDUP_LATEST_SNAPSHOT_SQL
    ),
    "sample_train_test_split": QuerySpec(
        sample_train_test_split, SAMPLE_TRAIN_TEST_SPLIT_SQL
    ),
    "window_pareto_share": QuerySpec(
        window_pareto_share, WINDOW_PARETO_SHARE_SQL
    ),
    "scan_schema_evolution": QuerySpec(
        scan_schema_evolution, SCAN_SCHEMA_EVOLUTION_SQL
    ),
}
