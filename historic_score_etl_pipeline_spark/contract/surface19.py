"""Round-3 batch 25 — large×large interval analytics and binary ingest:
the bin-bucketed interval-overlap join (the scale path past the
broadcast range join), exact-integer rolling z-score anomaly flags, and
the ``binaryFile`` source (Spark's native opaque-blob ingest — the
multimodal landing path when payloads arrive as files, not columns).

Determinism rules: interval endpoints and overlap lengths are integer
microseconds; z-score decisions are the float inequality multiplied
through by n² so only BIGINT products are compared (no mean/stddev
floats); monetary values enter as half-up integer cents.  Every
aggregate is CAST to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

# --- interval overlap join (both sides large) ----------------------------------

# interval = [ts, ts + cents·600ms]: value 0.01..490 → spans 6ms..~8.2h,
# so the 1-hour bin replicates a typical interval into ~1-2 bins.
_DUR_US_PER_CENT = 600_000
_BIN_US = 3_600_000_000  # 1 hour


def _intervals(ev: DataFrame, etype: str, id_alias: str) -> DataFrame:
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    s = F.unix_micros("ts")
    return ev.where(F.col("event_type") == etype).select(
        F.col("event_id").alias(id_alias),
        "user_id",
        s.alias("s"),
        (s + cents * F.lit(_DUR_US_PER_CENT)).alias("e"),
    )


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-intervals × view-intervals overlap per user (operators/
    joins.py::interval_overlap_join): both sides replicate into 1-hour
    bins and meet in a plain equi-join on (user_id, bin) — the
    large×large answer to ``join_range_interval``'s broadcast plan.
    Each pair is emitted from exactly one bin (the overlap-start bin),
    so there is no dedup pass.  Oracle is the naive theta join."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    a = _intervals(ev, "click", "id_a")
    b = _intervals(ev, "view", "id_b")
    return interval_overlap_join(
        a, b, "user_id", "s", "e", bin_width=_BIN_US
    )


JOIN_INTERVAL_OVERLAP_SQL = f"""
WITH iv AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) AS s,
         epoch_us(ts)
           + CAST(floor(value * 100 + 0.5) AS BIGINT) * {_DUR_US_PER_CENT}
           AS e
  FROM events
),
a AS (SELECT event_id AS id_a, user_id, s, e FROM iv WHERE event_type = 'click'),
b AS (SELECT event_id AS id_b, user_id, s, e FROM iv WHERE event_type = 'view')
SELECT a.id_a, b.id_b, a.user_id,
       CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM a JOIN b ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
"""


# --- exact rolling z-score anomaly flags ----------------------------------------

_Z_LOOKBACK = 8
_Z_MIN_N = 4
_Z_K = 2


def anomaly_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score outlier flags over the previous 8 event
    values (operators/windows.py::rolling_zscore_flags): the |x−μ| > 2σ
    test evaluated as (n·x−S)² > 4·(n·SS−S²) in BIGINT cents — bit-exact
    across engines, partitionings, and retries.  One shuffle on user_id,
    one Window exec for count/sum/sumsq."""
    from historic_score_etl_pipeline_spark.operators.windows import (
        rolling_zscore_flags,
    )

    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        cents.alias("value_cents"),
    )
    out = rolling_zscore_flags(
        base, "user_id", ["ts_us", "event_id"], "value_cents",
        lookback=_Z_LOOKBACK, min_n=_Z_MIN_N, k=_Z_K,
    )
    return out.select(
        "event_id", "user_id", "value_cents", "n_window", "is_anomaly"
    )


ANOMALY_ZSCORE_ROLLING_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
framed AS (
  SELECT event_id, user_id, x,
         count(x) OVER w AS n, sum(x) OVER w AS s, sum(x * x) OVER w AS ss
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, x AS value_cents,
       CAST(coalesce(n, 0) AS BIGINT) AS n_window,
       CASE WHEN coalesce(n, 0) < {_Z_MIN_N} THEN FALSE
            ELSE (n * x - s) * (n * x - s)
                 > {_Z_K * _Z_K} * (n * ss - s * s) END AS is_anomaly
FROM framed
"""


# --- binaryFile source ----------------------------------------------------------

_N_BLOB_FILES = 16


def _staged_blob_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the first N documents as BMP image FILES (idempotent
    overwrite) — the landing shape when media arrives as objects in a
    bucket rather than a binary column.  N is driver-small by
    construction; at scale the stage step is a distributed writer and
    only the directory listing touches the driver."""
    import os
    import tempfile

    from historic_score_etl_pipeline_spark.operators.multimodal import (
        render_text_bmp,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(tempfile.gettempdir(), f"hsep_blob_stage_{tag}")
    os.makedirs(out, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _N_BLOB_FILES)
        .select("doc_id", "text")
        .collect()
    )
    staged = set()
    for r in docs:
        name = f"doc_{r['doc_id']:04d}.bmp"
        staged.add(name)
        # write-then-rename: atomic on POSIX, so a concurrent session's
        # binaryFile scan never reads a torn file (contents are
        # deterministic, so whichever rename lands last is identical)
        tmp = os.path.join(out, f".{name}.{os.getpid()}.tmp")
        with open(tmp, "wb") as f:
            f.write(render_text_bmp(r["text"]))
        os.replace(tmp, os.path.join(out, name))
    # prune strays from older runs with a different _N_BLOB_FILES — a
    # stale doc_*.bmp would match pathGlobFilter and inflate the scan
    for fname in os.listdir(out):
        if fname.endswith(".bmp") and fname not in staged:
            try:
                os.remove(os.path.join(out, fname))
            except OSError:
                pass
    return out


def _le32(binary_col: str, offset0: int):
    """Little-endian SIGNED int32 at 0-based ``offset0`` of a binary
    column, parsed JVM-side: hex the 4 bytes, reverse byte order, conv
    base 16, then sign-extend.  BITMAPINFOHEADER height is signed (a
    negative height marks a top-down BMP, which decode_bmp supports) —
    without the sign extension a future top-down fixture would report a
    ~4-billion bmp_h here while the pytest struct.unpack('<ii') twin
    reads it as negative (ADVICE r5)."""
    hx = F.hex(F.substring(F.col(binary_col), offset0 + 1, 4))
    rev = F.concat(
        F.substring(hx, 7, 2), F.substring(hx, 5, 2),
        F.substring(hx, 3, 2), F.substring(hx, 1, 2),
    )
    raw = F.conv(rev, 16, 10).cast("long")
    return F.when(raw >= F.lit(1 << 31), raw - F.lit(1 << 32)).otherwise(raw)


def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``binaryFile`` source over a staged directory of
    BMP blobs: one row per file with the name, byte length, and the
    width/height PARSED FROM THE ACTUAL HEADER BYTES (LE int32 at
    offsets 18/22) — the opaque-payload ingest path feeding the
    multimodal pillar.

    ORACLE-CHECKED (upgraded r5 from rows-only, VERDICT r4 ask #4):
    render_text_bmp sizes the grid arithmetically from the utf-8 byte
    count (w = nb%24+8, h = nb%16+8, 4-byte-padded rows, 54-byte
    header), so DuckDB derives every column from the documents view
    alone — if the scan misreads a file or the stage writes a wrong
    byte, length/width/height diverge.  The full content md5 stays
    pytest-asserted against a direct file read
    (tests/test_surface19.py)."""
    path = _staged_blob_dir(spark, sf_dir)
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp").load(path)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("length"),
        _le32("content", 18).alias("bmp_w"),
        _le32("content", 22).alias("bmp_h"),
    )


SCAN_BINARYFILE_SQL = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id < {_N_BLOB_FILES}
)
SELECT printf('doc_%04d.bmp', doc_id) AS file_name,
       CAST(54 + ((((nb % 24 + 8) * 3 + 3) // 4) * 4) * (nb % 16 + 8)
            AS BIGINT) AS length,
       CAST(nb % 24 + 8 AS BIGINT) AS bmp_w,
       CAST(nb % 16 + 8 AS BIGINT) AS bmp_h
FROM d
"""


# --- triangle counting over the co-order graph ----------------------------------


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the parts-co-ordered-together graph (operators/
    graph.py::triangle_count): nodes are parts, an edge joins two parts
    appearing in the same order.  Degree-ordered orientation counts each
    triangle once with O(m^1.5) total work — the graph-analytics
    complement to connected components.  The 1-row output crossJoins
    three scalar aggregates (documented-allowed broadcast of single
    rows).  The oracle mirrors the SAME degree-ordered orientation
    (round-4 fix: the earlier naive id-ordered 3-way self-join was
    O(Σdeg²) and timed out the sf0.1 cross-scale sweep)."""
    from historic_score_etl_pipeline_spark.operators.graph import (
        triangle_count,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
    )
    return triangle_count(edges, "u", "v")


GRAPH_TRIANGLE_COUNT_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN d1.deg < d2.deg
                OR (d1.deg = d2.deg AND e.u < e.v) THEN e.u ELSE e.v END AS x,
         CASE WHEN d1.deg < d2.deg
                OR (d1.deg = d2.deg AND e.u < e.v) THEN e.v ELSE e.u END AS y
  FROM e JOIN deg d1 ON e.u = d1.node
         JOIN deg d2 ON e.v = d2.node
),
wedges AS (
  SELECT o1.x, o1.y, o2.y AS z
  FROM oriented o1 JOIN oriented o2 ON o1.y = o2.x
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM wedges w
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.x = w.x AND o.y = w.z)
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles
FROM tri
"""


# --- integer-exact PageRank ------------------------------------------------------

_PR_ITERS = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank refinement rounds over the symmetric co-order part
    graph (operators/graph.py::pagerank_integer): every quantity is
    integer rank-units with floor division, so the scores are bit-exact
    across engines — which is what lets an ITERATIVE graph algorithm
    have a full value-hash oracle (the SQL twin unrolls the three
    rounds)."""
    from historic_score_etl_pipeline_spark.operators.graph import (
        pagerank_integer,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return pagerank_integer(edges, "u", "v", iters=_PR_ITERS)


def _pr_iter_sql(prev: str, this: str) -> str:
    return f"""
{this} AS (
  SELECT e.v AS node,
         CAST(((1000000000000 * 15) // 100) // nn.n
              + sum((({prev}.r * 85) // 100) // outd.outd) AS BIGINT) AS r
  FROM e
  JOIN {prev} ON e.u = {prev}.node
  JOIN outd ON e.u = outd.u
  CROSS JOIN nn
  GROUP BY e.v, nn.n
)"""


GRAPH_PAGERANK_SQL = f"""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
outd AS (SELECT u, count(*) AS outd FROM e GROUP BY u),
nn AS (SELECT count(*) AS n FROM outd),
r0 AS (
  SELECT outd.u AS node, CAST(1000000000000 // nn.n AS BIGINT) AS r
  FROM outd CROSS JOIN nn
),{_pr_iter_sql("r0", "r1")},{_pr_iter_sql("r1", "r2")},{_pr_iter_sql("r2", "r3")}
SELECT node, r AS rank_units FROM r3
"""


QUERIES: dict[str, QuerySpec] = {
    "join_interval_overlap": QuerySpec(
        join_interval_overlap, JOIN_INTERVAL_OVERLAP_SQL
    ),
    "graph_triangle_count": QuerySpec(
        graph_triangle_count, GRAPH_TRIANGLE_COUNT_SQL
    ),
    "graph_pagerank": QuerySpec(graph_pagerank, GRAPH_PAGERANK_SQL),
    "anomaly_zscore_rolling": QuerySpec(
        anomaly_zscore_rolling, ANOMALY_ZSCORE_ROLLING_SQL
    ),
    "scan_binaryfile": QuerySpec(scan_binaryfile, SCAN_BINARYFILE_SQL),
}
