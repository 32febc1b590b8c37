"""Batch-45 behavior: struct-fold vs python loop, map render vs dict,
set ops vs python sets, ratio-to-report vs per-order recompute, degree
buckets vs bit_length — recompute twins."""

from __future__ import annotations

import math

from historic_score_etl_pipeline_spark.contract import surface38
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _fix(x: float) -> int:
    return math.floor(float(x) * 1e6 + 0.5)


def test_reduce_weighted_matches_python_fold(spark, sf_oracle):
    got = {
        r["vec_id"]: (r["n_dims"], r["wsum_fp"], r["sum_fp"], r["sumsq_fp"])
        for r in surface38.hof_reduce_weighted(spark, sf_oracle).collect()
    }
    rows = load_table(spark, sf_oracle, "embeddings").collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        f = [_fix(x) for x in r["embedding"]]
        want = (
            len(f),
            sum((i + 1) * v for i, v in enumerate(f)),
            sum(f),
            sum(v * v for v in f),
        )
        assert got[r["vec_id"]] == want


def test_map_entries_match_dict(spark, sf_oracle):
    got = {
        r["user_id"]: (r["n_types"], r["n_clicks"], r["type_counts"])
        for r in surface38.map_group_entries(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("event_type IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    )
    cnt: dict[int, dict[str, int]] = {}
    for r in rows:
        cnt.setdefault(r["user_id"], {}).setdefault(r["event_type"], 0)
        cnt[r["user_id"]][r["event_type"]] += 1
    assert set(got) == set(cnt)
    for u, d in cnt.items():
        rendered = ",".join(f"{k}:{d[k]}" for k in sorted(d))
        assert got[u] == (len(d), d.get("click", 0), rendered)


def test_setops_match_python_sets(spark, sf_oracle):
    got = {
        r["doc_id"]: (
            r["n_union"],
            r["n_intersect"],
            r["n_only_first"],
            r["shared_csv"],
        )
        for r in surface38.array_setops_sorted(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "text")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        ws = r["text"].strip().lower().split()
        a, b = set(ws[: len(ws) // 2]), set(ws[len(ws) // 2 :])
        want = (
            len(a | b),
            len(a & b),
            len(a - b),
            ",".join(sorted(a & b)),
        )
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_ratio_to_report_per_order(spark, sf_oracle):
    out = surface38.window_ratio_to_report(spark, sf_oracle).collect()
    by_order: dict[int, list] = {}
    for r in out:
        by_order.setdefault(r["l_orderkey"], []).append(r)
    assert by_order
    for ok, lines in by_order.items():
        total = sum(r["cents"] for r in lines)
        for r in lines:
            assert r["share_ppm"] == r["cents"] * 1_000_000 // total
        # ranks are a permutation of 1..n following (share desc, line asc)
        ordered = sorted(lines, key=lambda r: (-r["share_ppm"], r["l_linenumber"]))
        assert [r["rnk"] for r in ordered] == list(range(1, len(lines) + 1)), ok
        # shares sum to at most 1e6 (floor division) and within n of it
        s = sum(r["share_ppm"] for r in lines)
        assert 1_000_000 - len(lines) <= s <= 1_000_000


def test_degree_buckets_match_bit_length(spark, sf_oracle):
    rows = surface38.graph_degree_distribution(spark, sf_oracle).collect()
    assert rows
    total_nodes = 0
    for r in rows:
        b = r["log2_bucket"]
        assert r["min_deg"].bit_length() - 1 == b
        assert r["max_deg"].bit_length() - 1 == b
        assert 2**b <= r["min_deg"] <= r["max_deg"] < 2 ** (b + 1)
        total_nodes += r["n_nodes"]
    # node count ties out against the edge builder
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b_ = li.alias("a"), li.alias("b")
    from pyspark.sql import functions as F

    edges = (
        a.join(b_, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    n_nodes = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    assert total_nodes == n_nodes
