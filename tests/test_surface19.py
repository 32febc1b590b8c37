"""Batch-25 behavior: interval-overlap join against a brute-force Python
recompute (including the emit-once/no-duplicates property), exact
rolling z-score flags against a float recompute, and binaryFile content
hashes against direct file reads (contract/surface19.py,
operators/joins.py, operators/windows.py)."""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface19
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _interval_rows(spark, sf_dir, etype):
    ev = load_table(spark, sf_dir, "events")
    rows = ev.where(F.col("event_type") == etype).select(
        "event_id", "user_id", F.unix_micros("ts").alias("s"), "value"
    ).collect()
    out = []
    for r in rows:
        cents = int(math.floor(r["value"] * 100 + 0.5))
        out.append(
            (r["event_id"], r["user_id"], r["s"],
             r["s"] + cents * surface19._DUR_US_PER_CENT)
        )
    return out


def test_interval_overlap_matches_bruteforce_and_is_duplicate_free(
    spark, sf_oracle
):
    a = _interval_rows(spark, sf_oracle, "click")
    b = _interval_rows(spark, sf_oracle, "view")
    by_user: dict[int, list] = {}
    for row in b:
        by_user.setdefault(row[1], []).append(row)
    expected = {}
    for id_a, user, s_a, e_a in a:
        for id_b, _u, s_b, e_b in by_user.get(user, []):
            if s_a <= e_b and s_b <= e_a:
                expected[(id_a, id_b)] = (
                    user, min(e_a, e_b) - max(s_a, s_b)
                )

    got_rows = surface19.join_interval_overlap(spark, sf_oracle).collect()
    # emit-once: no (id_a, id_b) appears twice even when a pair shares
    # several bins
    keys = [(r["id_a"], r["id_b"]) for r in got_rows]
    assert len(keys) == len(set(keys))
    got = {
        (r["id_a"], r["id_b"]): (r["user_id"], r["overlap_us"])
        for r in got_rows
    }
    assert got == expected
    assert len(got) > 0


def test_interval_overlap_multi_bin_pair_still_single_row(spark):
    """Two intervals overlapping across >1 shared bin must emit one row
    with the exact overlap length."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    W = 100
    a = spark.createDataFrame(
        [(1, 10, 50, 350)], "id_a long, k long, s long, e long"
    )
    b = spark.createDataFrame(
        [(2, 10, 120, 500), (3, 10, 400, 600), (4, 99, 0, 1000)],
        "id_b long, k long, s long, e long",
    )
    rows = interval_overlap_join(a, b, "k", "s", "e", bin_width=W).collect()
    got = {(r["id_a"], r["id_b"]): r["overlap_us"] for r in rows}
    # (1,2): overlap [120,350] = 230 spanning bins 1-3; (1,3) disjoint;
    # (1,4) different key
    assert got == {(1, 2): 230}


def test_zscore_flags_match_float_recompute(spark, sf_oracle):
    """The integer inequality must agree with the direct float z-score on
    every row (strict > on both sides; values where the two could differ
    by FP rounding don't occur in cents-integer data)."""
    out = surface19.anomaly_zscore_rolling(spark, sf_oracle).collect()
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        cents = int(math.floor(r["value"] * 100 + 0.5))
        by_user.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["event_id"], cents)
        )
    expected = {}
    for user, lst in by_user.items():
        lst.sort()
        for i, (_ts, eid, x) in enumerate(lst):
            window = [c for _t, _e, c in lst[max(0, i - surface19._Z_LOOKBACK):i]]
            n = len(window)
            if n < surface19._Z_MIN_N:
                expected[eid] = (n, False)
                continue
            s, ss = sum(window), sum(c * c for c in window)
            lhs = (n * x - s) ** 2
            rhs = surface19._Z_K ** 2 * (n * ss - s * s)
            expected[eid] = (n, lhs > rhs)
    got = {r["event_id"]: (r["n_window"], r["is_anomaly"]) for r in out}
    assert got == expected
    assert any(flag for _n, flag in got.values())  # anomalies do fire


def test_binaryfile_hashes_match_direct_reads(spark, sf_oracle):
    """Byte-level check the SQL oracle can't do: every staged file is
    EXACTLY render_text_bmp(text), and the query's header-parsed
    dimensions match a struct.unpack of the same bytes."""
    import struct

    from historic_score_etl_pipeline_spark.operators.multimodal import (
        render_text_bmp,
    )
    from historic_score_etl_pipeline_spark.sources.catalog import load_table

    out = {
        r["file_name"]: (r["length"], r["bmp_w"], r["bmp_h"])
        for r in surface19.scan_binaryfile(spark, sf_oracle).collect()
    }
    assert len(out) == surface19._N_BLOB_FILES
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents")
        .where(F.col("doc_id") < surface19._N_BLOB_FILES)
        .collect()
    }
    staged = surface19._staged_blob_dir(spark, sf_oracle)
    for name, (length, w, h) in out.items():
        payload = open(os.path.join(staged, name), "rb").read()
        assert payload == render_text_bmp(texts[int(name[4:8])])
        assert length == len(payload)
        assert (w, h) == struct.unpack_from("<ii", payload, 18)
        assert hashlib.md5(payload).hexdigest()  # md5 path stays exercised


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge + a pendant: 4 nodes {1,2,3,4} fully connected
    except (3,4), plus 5-6. Triangles: (1,2,3) and (1,2,4) → 2."""
    from historic_score_etl_pipeline_spark.operators.graph import (
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6), (2, 1), (3, 3)],
        "u long, v long",
    )  # includes a duplicate reversed edge and a self-loop
    row = triangle_count(edges, "u", "v").collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (6, 6, 2)


def test_triangle_count_plan_has_no_wedge_scale_hazard(spark):
    """The edge-iterator formulation must never materialize the wedge
    fan-out or broadcast anything graph-sized: no nested-loop or
    cartesian join anywhere, and the two adjacency probes are
    PARTITIONED joins (Broadcast* appears only in the |V|-row degree
    joins, never feeding an array-carrying probe)."""
    from historic_score_etl_pipeline_spark.operators.graph import (
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (5, 6), (2, 1), (3, 3)],
        "u long, v long",
    )
    df = triangle_count(edges, "u", "v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the one BNLJ is the documented 1-row scalar crossJoin of the
    # output counts — never a graph-sized side
    probe_lines = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
    ]
    assert len(probe_lines) >= 2, plan  # both adjacency probes partitioned
    row = df.collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (6, 6, 2)


def test_triangle_count_matches_python_recompute(spark, sf_smoke):
    """Adjacency-set recompute on the sf0.001 co-order graph: Σ_edges
    |N(u)∩N(v)| counts each triangle 3× ."""
    from historic_score_etl_pipeline_spark.contract.surface19 import (
        graph_triangle_count,
    )

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    adj: dict[int, set[int]] = {}
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                edges.add((u, v))
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    tri3 = sum(len(adj[u] & adj[v]) for u, v in edges)
    assert tri3 % 3 == 0

    row = graph_triangle_count(spark, sf_smoke).collect()[0]
    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri3 // 3
    assert row["n_triangles"] > 0


def test_pagerank_matches_python_recompute_exactly(spark, sf_smoke):
    """Integer PageRank must be BIT-EXACT against a from-scratch Python
    recompute (same floor-division recurrence), and the total mass must
    stay within N truncation units of SCALE·(sum of base + damped)."""
    from historic_score_etl_pipeline_spark.contract.surface19 import (
        graph_pagerank, _PR_ITERS,
    )
    from historic_score_etl_pipeline_spark.operators.graph import (
        PAGERANK_SCALE,
    )

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    adj: dict[int, set[int]] = {}
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    adj.setdefault(u, set()).add(v)
    n = len(adj)
    base = ((PAGERANK_SCALE * 15) // 100) // n
    r = {u: PAGERANK_SCALE // n for u in adj}
    for _ in range(_PR_ITERS):
        acc = {u: 0 for u in adj}
        for u, nbrs in adj.items():
            per_edge = ((r[u] * 85) // 100) // len(nbrs)
            for v in nbrs:
                acc[v] += per_edge
        r = {u: base + acc[u] for u in adj}

    got = {
        row["node"]: row["rank_units"]
        for row in graph_pagerank(spark, sf_smoke).collect()
    }
    assert got == r
    # mass sanity: total stays within truncation slack of the ideal
    ideal = n * base + (PAGERANK_SCALE * 85) // 100
    assert 0 < sum(got.values()) <= ideal
    # each iteration truncates < 1 unit per node (×85//100) plus
    # < out(u) units per node (div out) → < n + m per round, compounding
    m = sum(len(v) for v in adj.values())
    assert ideal - sum(got.values()) < _PR_ITERS * (n + m)
