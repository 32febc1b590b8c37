"""Batch-41 behavior: PMI vs direct counts, winsorize vs sequential
clip, stitch grams vs python slicing, skew/kurt vs numpy-free moments,
ALL-rewrite equivalence — recompute twins."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface34
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _events(spark, sf):
    return (
        load_table(spark, sf, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .collect()
    )


def test_pmi_matches_direct_counts(spark, sf_oracle):
    rows = [r for r in _events(spark, sf_oracle) if r["event_type"]]
    sess: dict[tuple, set] = {}
    for r in rows:
        sess.setdefault((r["user_id"], r["day"]), set()).add(r["event_type"])
    n_sessions = len(sess)
    singles: dict[str, int] = {}
    pairs: dict[tuple, int] = {}
    for types in sess.values():
        for t in types:
            singles[t] = singles.get(t, 0) + 1
        ts = sorted(types)
        for i, x in enumerate(ts):
            for y in ts[i + 1 :]:
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
    want = {}
    for (x, y), nxy in pairs.items():
        pmi = math.floor(
            math.log((nxy * n_sessions) / (singles[x] * singles[y])) * 1e6
            + 0.5
        )
        want[(x, y)] = (nxy, singles[x], singles[y], n_sessions, pmi)
    got = {
        (r["type_x"], r["type_y"]): (
            r["n_xy"],
            r["n_x"],
            r["n_y"],
            r["n_sessions"],
            r["pmi_unats"],
        )
        for r in surface34.event_cooccurrence_pmi(spark, sf_oracle).collect()
    }
    assert got == want


def test_winsorize_matches_sequential(spark, sf_oracle):
    rows = _events(spark, sf_oracle)
    by_user: dict[int, list] = {}
    for r in rows:
        cents = math.floor(r["value"] * 100 + 0.5)
        by_user.setdefault(r["user_id"], []).append((cents, r["event_id"]))
    want = {}
    for u, lst in by_user.items():
        lst.sort()
        n = len(lst)
        lo = lst[(n * 10 + 99) // 100 - 1][0]
        hi = lst[(n * 90 + 99) // 100 - 1][0]
        wsum = sum(max(min(c, hi), lo) for c, _ in lst)
        want[u] = (n, lo, hi, wsum, sum(c for c, _ in lst))
    got = {
        r["user_id"]: (
            r["n_events"],
            r["lo_cents"],
            r["hi_cents"],
            r["winsorized_sum_cents"],
            r["raw_sum_cents"],
        )
        for r in surface34.window_winsorize_clip(spark, sf_oracle).collect()
    }
    assert got == want
    # winsorization can only pull the sum toward the interior
    for u, (n, lo, hi, ws, raw) in want.items():
        assert lo <= hi


def test_stitch_matches_python_slicing(spark, sf_oracle):
    docs = (
        load_table(spark, sf_oracle, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    heads, tails = {}, {}
    for r in docs:
        toks = re.split(r"\s+", r["text"].strip().lower())
        if len(toks) < 3:
            continue
        heads[r["doc_id"]] = (r["lang"], " ".join(toks[:3]))
        tails[r["doc_id"]] = (r["lang"], " ".join(toks[-3:]))
    want = set()
    for ida, (la, g_tail) in tails.items():
        for idb, (lb, g_head) in heads.items():
            if ida != idb and la == lb and g_tail == g_head:
                want.add((ida, idb, la, g_tail))
    got = {
        (r["id_a"], r["id_b"], r["lang"], r["gram"])
        for r in surface34.text_split_doc_stitch(spark, sf_oracle).collect()
    }
    assert got == want


def test_skew_kurt_matches_moment_formula(spark, sf_oracle):
    rows = [r for r in _events(spark, sf_oracle) if r["value"] is not None]
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            math.floor(r["value"] * 100 + 0.5)
        )
    want = {}
    for t, xs in by_type.items():
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        s3 = sum(x * x * x for x in xs)
        s4 = sum((x * x) * (x * x) for x in xs)
        nd, s1d, s2d, s3d, s4d = (
            float(n), float(s1), float(s2), float(s3), float(s4),
        )
        mean = s1d / nd
        m2 = s2d / nd - mean * mean
        m3 = s3d / nd - 3 * mean * (s2d / nd) + 2 * mean * mean * mean
        m4 = (
            s4d / nd
            - 4 * mean * (s3d / nd)
            + 6 * (mean * mean) * (s2d / nd)
            - 3 * (mean * mean) * (mean * mean)
        )
        if m2 > 0:
            skew = math.floor(m3 / (m2 * math.sqrt(m2)) * 1e6 + 0.5)
            kurt = math.floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5)
        else:
            skew = kurt = None
        want[t] = (n, skew, kurt)
    got = {
        r["event_type"]: (r["n"], r["skew_r6fp"], r["kurt_r6fp"])
        for r in surface34.agg_skew_kurt(spark, sf_oracle).collect()
    }
    assert got == want


def test_any_all_rewrite_matches_direct_threshold(spark, sf_oracle):
    """The max-rewrite must equal filtering by the computed max of the
    per-status averages, and every kept custkey must be Asian."""
    orders = load_table(spark, sf_oracle, "orders").collect()
    by_status: dict[str, list] = {}
    for r in orders:
        if r["o_orderpriority"] == "1-URGENT":
            by_status.setdefault(r["o_orderstatus"], []).append(
                r["o_totalprice"]
            )
    assert by_status, "fixture must have 1-URGENT orders"
    threshold = max(sum(v) / len(v) for v in by_status.values())
    cust = load_table(spark, sf_oracle, "customer").collect()
    nation = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in load_table(spark, sf_oracle, "nation").collect()
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in load_table(spark, sf_oracle, "region").collect()
    }
    asian = {
        r["c_custkey"]
        for r in cust
        if region[nation[r["c_nationkey"]]] == "ASIA"
    }
    want = {
        (r["o_orderkey"], r["o_custkey"])
        for r in orders
        if r["o_orderpriority"] == "1-URGENT"
        and r["o_totalprice"] > threshold
        and r["o_custkey"] in asian
    }
    got = {
        (r["o_orderkey"], r["o_custkey"])
        for r in surface34.sql_any_all_semijoin(spark, sf_oracle).collect()
    }
    assert got == want
