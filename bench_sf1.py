#!/usr/bin/env python
"""Cross-scale spot-bench: the five heaviest queries at sf0.1 vs a
synthetic ~sf1 replica, with fitted scaling exponents (VERDICT r4 ask
#7 — the 100 TB design claims were argued from plans at sf0.1; this
adds one empirical order of magnitude).

The sf1 replica is built ONCE into /tmp/hsep_sf1 by tiling sf0.1 ten
times with key-shifted copies:

* ``orders``/``lineitem``/``customer`` shift (orderkey, custkey,
  partkey) by copy-index strides → ten disjoint co-order graphs, so
  graph work should scale ~linearly in edges for the fixed degree
  distribution.  For triangle_count (edge-iterator formulation: one
  adjacency-array aggregate, two sorted joins — no broadcast branch)
  the 12M-edge replica is the evidence that the per-edge intersection
  cost stays ~m^1.5-bounded when the adjacency arrays are 10× wider.
* ``documents`` shifts doc_id and SUFFIXES EVERY TOKEN with the copy
  index — without that, clones would band-collide in LSH and the
  candidate-pair count would blow up 45× instead of scaling linearly.
* ``events`` shifts (event_id, user_id) by copy-index strides (since
  _BUILT_v2) → ten disjoint user populations, so the per-user funnel
  and rolling-median heavies scale in rows, not in per-user history.
* ``part`` is tiled with lineitem's l_partkey stride (v4) so part
  joins keep matching; region/nation/supplier stay 1× — their keys are
  never strided, and a fixed dim joined by a growing fact is exactly
  how a real warehouse scales.  This replica is a THROUGHPUT fixture,
  not a correctness fixture; correctness always runs on driver
  testdata.

Usage: python bench_sf1.py   → one JSON line
  {"metric": "sf1_scaling", "sf01": {...}, "sf1": {...},
   "exponent": {...}}  where exponent = log10(t_sf1 / t_sf0.1).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(tempfile.gettempdir(), "hsep_sf1")
COPIES = 10
# key strides: max key at sf0.1 rounded up to a clean power-of-10 grid
STRIDE_ORDER = 1_000_000
STRIDE_CUST = 100_000
STRIDE_PART = 100_000
STRIDE_DOC = 10_000

HEAVIES = [
    "graph_triangle_count",
    "graph_pagerank",
    "dedup_pipeline_e2e",
    "text_bigram_surprisal",
    # round-6 additions (VERDICT r5 ask #6): the heaviest new queries
    "dedup_minhash_jaccard_est",   # documents (tiled, token-suffixed)
    "event_funnel_conversion",     # events (tiled since _BUILT_v2)
    "window_rolling_median",       # events (tiled since _BUILT_v2)
    # round-6 session-2 additions: the heaviest new operators
    "embed_lsh_hyperplane",        # embeddings (tiled+rotated, _BUILT_v3)
    "text_rake_phrases",           # documents (tiled, token-suffixed)
    "multimodal_image_ahash",      # documents (tiled -> distinct pixels)
    # round-7 additions (VERDICT r6 ask #2): the session-3 heavies
    "graph_hits_two_rounds",       # lineitem co-order graph (tiled)
    "graph_kcore_two_pass",        # lineitem co-order graph (tiled)
    "text_bm25_score",             # documents (tiled, token-suffixed)
    "udaf_longest_increasing_run",  # lineitem (orderkey-strided)
    # round-9 additions (VERDICT r8 asks #1/#2): the corpus-width
    # siblings of the two fixed-banding keys.  dedup_simhash_hamming
    # itself is NOT in the list: its saturation is established (candidate
    # band-pairs 3.4M sf0.1 → 321M sf1 → 31.8B sf10, ~n² — the sf10 join
    # is not completable; see BASELINE.md §r9) and keeping it would add
    # ~25 min of known-quadratic work to every default bench run.
    "dedup_simhash_scaled",        # documents (tiled, token-suffixed)
    "embed_lsh_hyperplane_scaled",  # embeddings (tiled+decorrelated)
]

# VERDICT r6 ask #3: one more order of magnitude for the 3 heaviest.
# The sf10 replica tiles ONLY the tables these three touch (lineitem
# for the two graph queries, documents for the dedup pipeline) 100x;
# every other table is the sf0.1 copy.  --sf10 measures sf1 -> sf10,
# the SECOND 10x decade, so the claim no longer rests on a single step.
SF10_HEAVIES = [
    "graph_triangle_count",
    "graph_pagerank",
    "dedup_pipeline_e2e",
    # round-8 additions (VERDICT r7 ask #7): next heavies by sf1 cost —
    # all three touch only the tables the sf10 replica already tiles
    # (lineitem co-order graph, token-suffixed documents)
    "graph_hits_two_rounds",
    "graph_kcore_two_pass",
    "text_bigram_surprisal",
    # round-8 session-3 additions: the remaining heavies whose tables the
    # replica already tiles (documents token-suffixed, lineitem strided)
    "text_bm25_score",
    "dedup_minhash_jaccard_est",
    "udaf_longest_increasing_run",
    # round-8 session-3, second batch: the event-series heavies (events
    # tiled in the v2 replica — users 100x, fixed series length/user)
    "event_funnel_conversion",
    "window_rolling_median",
    # round-8 session-3, third batch: embeddings tiled with the sign-flip
    # decorrelator (v3 replica) — the last heavy without an sf10 row
    "embed_lsh_hyperplane",
    # round-9 (VERDICT r8 asks #1/#2): the corpus-width siblings at the
    # second decade (documents / embeddings — both already tiled);
    # dedup_simhash_hamming excluded — measured-saturated, sf10 join is
    # 31.8B candidate pairs (BASELINE.md §r9)
    "dedup_simhash_scaled",
    "embed_lsh_hyperplane_scaled",
    # round-9 (VERDICT r8 ask #7): the next cost tier by r8 bench time —
    # every table already tiled (events v2, documents, embeddings v3)
    "event_anomaly_cusum",
    "embed_nearest_centroid",
    "join_asof_backward",
    "text_repetition",
    "dedup_decontaminate_13gram",
    # round-10 (VERDICT r9 ask #5): the next tier — structurally
    # interesting event-table shapes (all on the v2-tiled events:
    # 100x users, fixed per-user series length)
    "event_cooccurrence_pmi",       # distinct (user,type) co-occur join
    "window_distinct_count",        # two sorted passes per user shuffle
    "graph_bipartite_jaccard",      # type-type user-set overlap join
    "event_funnel_time_bounded",    # ordered per-user step scan
    # round-10 batch 2: every remaining headline query whose tables the
    # v3 replica tiled (lineitem/documents/events/embeddings) — closing
    # the second-decade coverage gap for the cheap tier.
    "agg_sum_avg",
    "dedup_exact",
    "dedup_near_minhash",
    "sim_topk_cosine",
    "sessionize_batch",
    "text_quality_score",
    "text_zipf_slope",
    "anomaly_zscore_rolling",
    "text_rake_phrases",
    "agg_countmin_sketch",
    "event_stickiness_dau_wau",
    "dedup_latest_snapshot",
    "shuffle_shard_pos",
    # round-10 batch 3: the join-family headliners, admitted by the v4
    # replica (orders/customer/part now tiled with the SAME strides the
    # facts use, so join keys keep matching; supplier/region/nation stay
    # 1× — their keys are never strided, and fixed-dim⋈growing-fact is
    # how real warehouses scale).
    "agg_collect_struct",
    "join_hash_equi",
    "join_multi_hop",
    "window_topk_recent",
    "window_running_sum",
    "stream_tumbling_daily",
    "join_asof_lastn",
    "window_range_7d",
    "dedup_contamination",
    "multimodal_png_roundtrip",
    "join_interval_overlap",
    "join_spatial_grid",
    "parse_token_records_h2h",
    "text_pack_shards",
    # round-11 (VERDICT r10 ask #2): parse_token_records was excluded
    # with a stale rationale ("joins token-parsed part keys" — it does
    # not; it is a pure posexplode div/mod pivot over documents'
    # first-12 tokens, surface.py:254, no join anywhere).  The per-copy
    # token suffix only lengthens tokens, which the positional parser is
    # indifferent to — same fixture class as parse_token_records_h2h,
    # which has been measured since r8.
    "parse_token_records",
]
OUT10 = os.path.join(tempfile.gettempdir(), "hsep_sf10")
COPIES10 = 100

# round-11 (VERDICT r10 ask #5): a THIRD decade (sf10 → sf100) for the
# cheapest sublinear heavies.  The banding saturation taught that one
# decade can flatter; the sf100 replica tiles the sf10 replica 10× for
# ONLY the tables these two touch (documents for dedup_exact, events
# for join_asof_lastn) — anything heavier would not fit the sandbox's
# time budget, and these two are the designated canaries (0.87 s and
# 0.99 s at sf10).  Every other table is the sf0.1 copy so the catalog
# stays complete.  --sf100 measures sf10 → sf100.
SF100_HEAVIES = [
    "dedup_exact",      # documents: 10M docs, re-suffixed per mega-copy
    "join_asof_lastn",  # events: 100M rows, 10× user populations
    # round-11 widening: every headline key that touches ONLY the two
    # tables the sf100 replica tiles (verified via load_table grep) and
    # costs ≲1 s at sf10 — a three-decade table for the text/event
    # families, not just the two canaries.  parse_token_records is
    # admitted for the same reason as sf10: the mega-copy re-suffix only
    # lengthens tokens and the positional parser is indifferent.
    "text_quality_score",          # per-char compute, 1.00 at decade 2
    "text_token_entropy",
    "text_repetition",
    "dedup_contamination",
    "dedup_decontaminate_13gram",  # gram-linear by construction (0.99)
    "parse_token_records",
    "sessionize_batch",
    "window_distinct_count",
    "event_anomaly_cusum",
]
OUT100 = os.path.join(tempfile.gettempdir(), "hsep_sf100")
COPIES100 = 10  # × the sf10 replica
# mega-strides: one clean decimal past the sf10 maxima (doc_id < 1e6,
# event_id < 1e9, user_id < 1e7 — asserted at build time)
STRIDE_DOC100 = 1_000_000
STRIDE_EVENT100 = 1_000_000_000
STRIDE_USER100 = 10_000_000

STRIDE_EVENT = 10_000_000
STRIDE_USER = 100_000

# ADVICE r10: the tiling silently assumes every source key stays below
# its stride — if SRC is ever regenerated at a larger scale the
# key-shifted copies overlap, join fan-out multiplies, and every timing
# and exponent derived from the replica is corrupted with no error.
# One DuckDB max() per (table, key) fails the build loudly instead.
_STRIDE_CHECKS: list[tuple[str, str, int]] = [
    ("orders", "o_orderkey", STRIDE_ORDER),
    ("orders", "o_custkey", STRIDE_CUST),
    ("lineitem", "l_orderkey", STRIDE_ORDER),
    ("lineitem", "l_partkey", STRIDE_PART),
    ("customer", "c_custkey", STRIDE_CUST),
    ("part", "p_partkey", STRIDE_PART),
    ("documents", "doc_id", STRIDE_DOC),
    ("events", "event_id", STRIDE_EVENT),
    ("events", "user_id", STRIDE_USER),
]


def _assert_strides(con, vec_stride: int) -> None:
    checks = _STRIDE_CHECKS + [("embeddings", "vec_id", vec_stride)]
    for table, col, stride in checks:
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]
        if mx is not None and int(mx) >= stride:
            raise RuntimeError(
                f"replica stride overflow: max({table}.{col}) = {mx} >= "
                f"stride {stride} — SRC grew; raise the strides before "
                "trusting any replica timing"
            )


def build_sf1() -> None:
    import duckdb

    marker = os.path.join(OUT, "_BUILT_v4")
    if os.path.exists(marker):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    _assert_strides(con, vec_stride=10_000)

    def tile(table: str, select_tpl: str) -> None:
        parts = [
            select_tpl.format(i=i, src=f"read_parquet('{SRC}/{table}.parquet')")
            for i in range(COPIES)
        ]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )

    tile(
        "orders",
        f"SELECT o_orderkey + {{i}} * {STRIDE_ORDER} AS o_orderkey, "
        f"o_custkey + {{i}} * {STRIDE_CUST} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        "FROM {src}",
    )
    tile(
        "lineitem",
        f"SELECT l_orderkey + {{i}} * {STRIDE_ORDER} AS l_orderkey, "
        f"l_partkey + {{i}} * {STRIDE_PART} AS l_partkey, "
        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM {src}",
    )
    tile(
        "customer",
        f"SELECT c_custkey + {{i}} * {STRIDE_CUST} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src}",
    )
    # v4: tile part with lineitem's l_partkey stride so part joins keep
    # matching the strided fact (admits lineitem(x)part keys to the
    # first-decade measurement too)
    tile(
        "part",
        f"SELECT p_partkey + {{i}} * {STRIDE_PART} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice FROM {src}",
    )
    tile(
        "documents",
        f"SELECT doc_id + {{i}} * {STRIDE_DOC} AS doc_id, "
        "regexp_replace(text, '(\\S+)', '\\1x{i}', 'g') AS text, "
        "lang, source, n_chars FROM {src}",
    )
    tile(
        "events",
        f"SELECT event_id + {{i}} * {STRIDE_EVENT} AS event_id, ts, "
        f"user_id + {{i}} * {STRIDE_USER} AS user_id, "
        "event_type, value, props FROM {src}",
    )
    # embeddings tile with a CYCLIC DIM ROTATION per copy: an id-shift
    # alone would leave 10 identical vector populations whose SRP
    # signatures band-collide copy-against-copy (45x candidate blowup);
    # rotating the dims decorrelates the projections while preserving
    # norms and the distance distribution — throughput scales in rows.
    tile(
        "embeddings",
        "SELECT vec_id + {i} * 10000 AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding "
        "ELSE embedding[{i} + 1:64] || embedding[1:{i}] END AS embedding, "
        "label FROM {src}",
    )
    for table in ("region", "nation", "supplier"):
        shutil.copyfile(f"{SRC}/{table}.parquet", f"{OUT}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def build_sf10() -> None:
    """Tile sf0.1 100x for the SF10_HEAVIES' tables only.

    lineitem: (l_orderkey, l_partkey) strided per copy -> 100 disjoint
    co-order part graphs (the triangle/pagerank fixture shape at 100x).
    documents: doc_id strided AND every token suffixed with the copy
    index -> no cross-copy LSH band collisions (the same adversarial
    care as the sf1 replica; without it candidates blow up ~4950x).
    """
    import duckdb

    marker = os.path.join(OUT10, "_BUILT_v4")
    if os.path.exists(marker):
        return
    shutil.rmtree(OUT10, ignore_errors=True)
    os.makedirs(OUT10, exist_ok=True)
    con = duckdb.connect()
    _assert_strides(con, vec_stride=1_000_000)

    def tile(table: str, select_tpl: str) -> None:
        parts = [
            select_tpl.format(i=i, src=f"read_parquet('{SRC}/{table}.parquet')")
            for i in range(COPIES10)
        ]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{OUT10}/{table}.parquet' (FORMAT PARQUET)"
        )

    tile(
        "lineitem",
        f"SELECT l_orderkey + {{i}} * {STRIDE_ORDER} AS l_orderkey, "
        f"l_partkey + {{i}} * {STRIDE_PART} AS l_partkey, "
        "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        "FROM {src}",
    )
    # v4: tile orders / customer / part with the SAME strides lineitem
    # already uses, so the strided fact keys keep matching — this is
    # what admits the join-family headliners (lineitem⋈orders,
    # orders⋈customer, lineitem⋈part) to the second-decade table.
    # supplier / region / nation stay 1× deliberately: their keys are
    # never strided, so a fixed dim joined by a growing fact is exactly
    # how a real warehouse scales.
    tile(
        "orders",
        f"SELECT o_orderkey + {{i}} * {STRIDE_ORDER} AS o_orderkey, "
        f"o_custkey + {{i}} * {STRIDE_CUST} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        "FROM {src}",
    )
    tile(
        "customer",
        f"SELECT c_custkey + {{i}} * {STRIDE_CUST} AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src}",
    )
    tile(
        "part",
        f"SELECT p_partkey + {{i}} * {STRIDE_PART} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice FROM {src}",
    )
    tile(
        "documents",
        f"SELECT doc_id + {{i}} * {STRIDE_DOC} AS doc_id, "
        "regexp_replace(text, '(\\S+)', '\\1x{i}', 'g') AS text, "
        "lang, source, n_chars FROM {src}",
    )
    # v2: tile events too (same strides as the sf1 replica) so the
    # event-series heavies get second-decade rows — users scale 100x,
    # per-user series length stays fixed, the realistic growth shape
    tile(
        "events",
        f"SELECT event_id + {{i}} * {STRIDE_EVENT} AS event_id, ts, "
        f"user_id + {{i}} * {STRIDE_USER} AS user_id, "
        "event_type, value, props FROM {src}",
    )
    # v3: tile embeddings with a PER-COPY DETERMINISTIC SIGN-FLIP
    # decorrelator.  The sf1 replica's cyclic dim rotation caps at 64
    # distinct copies (the dim count); diagonal ±1 transforms give 2^64
    # patterns — norms and intra-copy distances are exactly preserved
    # while every copy's hyperplane projections land in decorrelated
    # buckets, so LSH candidates keep scaling in rows, not copies².
    import hashlib

    def _flips(i: int) -> list[int]:
        # 64 sign bits = bytes 0–7 of the 16-byte digest
        dig = hashlib.md5(f"signflip_{i}".encode()).digest()
        return [1 if (dig[d // 8] >> (d % 8)) & 1 else -1
                for d in range(64)]

    emb_parts = []
    for i in range(COPIES10):
        flips = ", ".join(str(f) for f in _flips(i))
        emb_parts.append(
            f"SELECT vec_id + {i} * 1000000 AS vec_id, "
            f"list_transform(embedding, (x, d) -> "
            f"CAST(x * ([{flips}])[d] AS FLOAT)) AS embedding, "
            f"label FROM read_parquet('{SRC}/embeddings.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) "
        f"TO '{OUT10}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for table in ("region", "nation", "supplier"):
        shutil.copyfile(f"{SRC}/{table}.parquet", f"{OUT10}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def build_sf100() -> None:
    """Tile the sf10 replica 10× for the SF100_HEAVIES' tables only.

    documents: doc_id mega-strided AND every token RE-suffixed with the
    mega-copy index, so exact-dup fingerprint GROUPS scale in count — a
    plain id-shift would ×10 every group's size but freeze the group
    count, an easier aggregation shape than real corpus growth.
    events: (event_id, user_id) mega-strided → 10× user populations
    with fixed per-user series length, the realistic growth shape the
    sf1/sf10 replicas already use."""
    import duckdb

    marker = os.path.join(OUT100, "_BUILT_v1")
    if os.path.exists(marker):
        return
    build_sf10()
    shutil.rmtree(OUT100, ignore_errors=True)
    os.makedirs(OUT100, exist_ok=True)
    con = duckdb.connect()
    # same loud-overflow rule as _assert_strides, against the sf10 maxima
    for table, col, stride in (
        ("documents", "doc_id", STRIDE_DOC100),
        ("events", "event_id", STRIDE_EVENT100),
        ("events", "user_id", STRIDE_USER100),
    ):
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{OUT10}/{table}.parquet')"
        ).fetchone()[0]
        if mx is not None and int(mx) >= stride:
            raise RuntimeError(
                f"sf100 stride overflow: max(sf10 {table}.{col}) = {mx} "
                f">= {stride}"
            )

    def tile(table: str, select_tpl: str, strides: dict[str, int]) -> None:
        # offsets precomputed in Python: j * 1e9 as a DuckDB expression
        # multiplies two INT32 literals and overflows; a single big
        # literal parses as INT64
        parts = [
            select_tpl.format(
                j=j,
                src=f"read_parquet('{OUT10}/{table}.parquet')",
                **{k: j * s for k, s in strides.items()},
            )
            for j in range(COPIES100)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{OUT100}/{table}.parquet' (FORMAT PARQUET)"
        )

    tile(
        "documents",
        "SELECT doc_id + {doc_off} AS doc_id, "
        "regexp_replace(text, '(\\S+)', '\\1y{j}', 'g') AS text, "
        "lang, source, n_chars FROM {src}",
        {"doc_off": STRIDE_DOC100},
    )
    tile(
        "events",
        "SELECT event_id + {ev_off} AS event_id, ts, "
        "user_id + {user_off} AS user_id, "
        "event_type, value, props FROM {src}",
        {"ev_off": STRIDE_EVENT100, "user_off": STRIDE_USER100},
    )
    for table in (
        "region", "nation", "supplier", "customer", "orders",
        "lineitem", "part", "embeddings",
    ):
        shutil.copyfile(f"{SRC}/{table}.parquet", f"{OUT100}/{table}.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def run_set(
    spark, sf_dir: str, qs, flagship, names=None
) -> dict[str, float]:
    from historic_score_etl_pipeline_spark.sources.catalog import (
        stage_landing_zone,
    )

    staged = os.path.join(
        tempfile.gettempdir(),
        f"hsep_bench_stage_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    sf_dir = stage_landing_zone(spark, sf_dir, staged)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # untimed inter-query reap (r12): same isolation as bench.py — a
    # query must not be charged for the previous query's pinned blocks
    import gc as _gc

    from historic_score_etl_pipeline_spark.operators.pins import release_pins

    def _reap():
        release_pins()
        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out: dict[str, float] = {}
    for name in names if names is not None else HEAVIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        _reap()
    if flagship is not None:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(flagship(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out["flagship"] = round(best, 3)
    return out


def main() -> None:
    sf10_mode = "--sf10" in sys.argv[1:]
    sf100_mode = "--sf100" in sys.argv[1:]
    # --only=k1,k2 measures a subset (new keys / re-measurements) without
    # paying for the full heavy list (pagerank alone is ~240 s at sf10)
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    build_sf1()
    if sf10_mode:
        build_sf10()
    if sf100_mode:
        build_sf100()

    from historic_score_etl_pipeline_spark import contract
    from historic_score_etl_pipeline_spark.plans.flagship import (
        flagship_pipeline,
    )
    from historic_score_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    # same benign accumulator-race silencing as bench.py
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass
    # same small-file split policy as bench.py — the staged files are far
    # under the default 128 MB split, so scans would collapse to 1 task
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))

    qs = contract.queries()
    # warmup at the smallest SF: compile codegen before any timed pass
    warm = "/root/testdata/sf0.001"
    default_names = (
        SF100_HEAVIES if sf100_mode else SF10_HEAVIES if sf10_mode else HEAVIES
    )
    for name in only if only else default_names:
        try:
            qs[name](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    if sf100_mode:
        # third decade: sf10 -> sf100.  512 reduce partitions — the same
        # rows-per-task the sf10 run holds at 256, scaled with the data
        # (a cluster would add executors; local mode can only add
        # partitions so per-task state stays spillable).
        spark.conf.set("spark.sql.shuffle.partitions", "512")
        names100 = only if only else SF100_HEAVIES
        t10 = run_set(spark, OUT10, qs, None, names100)
        t100 = run_set(spark, OUT100, qs, None, names100)
        exp = {
            k: round(
                math.log10(max(t100[k], 1e-3) / max(t10[k], 1e-3)), 3
            )
            for k in t10
        }
        print(
            json.dumps(
                {
                    "metric": "sf100_scaling",
                    "copies": COPIES100 * COPIES10,
                    "conf": {
                        "driver_mem": os.environ.get(
                            "SPARK_DRIVER_MEM", "8g"
                        ),
                        "shuffle_partitions": 512,
                    },
                    "sf10": t10,
                    "sf100": t100,
                    "exponent": exp,
                }
            )
        )
        return

    if sf10_mode:
        # Scale the *session* with the data the way a cluster would:
        # 10x the rows per core -> more reduce partitions, so per-task
        # aggregate state (triangle adjacency arrays) stays spillable.
        # Launch with SPARK_DRIVER_MEM=48g: the default 8 GiB / 32
        # threads leaves ~150 MiB execution memory per task, which is
        # the local-mode harness constraint, not the plan, OOMing.
        spark.conf.set("spark.sql.shuffle.partitions", "256")
        # second decade: sf1 -> sf10, same session, best-of-2 each
        names10 = only if only else SF10_HEAVIES
        t1 = run_set(spark, OUT, qs, None, names10)
        t10 = run_set(spark, OUT10, qs, None, names10)
        exp = {
            k: round(math.log10(max(t10[k], 1e-3) / max(t1[k], 1e-3)), 3)
            for k in t1
        }
        print(
            json.dumps(
                {
                    "metric": "sf10_scaling",
                    "copies": COPIES10,
                    "conf": {
                        "driver_mem": os.environ.get(
                            "SPARK_DRIVER_MEM", "8g"
                        ),
                        "shuffle_partitions": 256,
                    },
                    "sf1": t1,
                    "sf10": t10,
                    "exponent": exp,
                }
            )
        )
        return

    t01 = run_set(spark, SRC, qs, None if only else flagship_pipeline, only)
    t1 = run_set(spark, OUT, qs, None if only else flagship_pipeline, only)
    exp = {
        k: round(math.log10(max(t1[k], 1e-3) / max(t01[k], 1e-3)), 3)
        for k in t01
    }
    print(
        json.dumps(
            {
                "metric": "sf1_scaling",
                "copies": COPIES,
                "sf01": t01,
                "sf1": t1,
                "exponent": exp,
            }
        )
    )


if __name__ == "__main__":
    main()
