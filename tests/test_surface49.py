"""Batch-56 behavior: Q13 zero-order customers, Q17 correlated-avg
decorrelation, linear-attribution credit conservation, checksum
order-invariance, sentence segmentation — pure-python recompute twins."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface49
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_q13_distribution_counts_zero_order_customers(spark, sf_oracle):
    custs = {
        r["c_custkey"]
        for r in load_table(spark, sf_oracle, "customer")
        .select("c_custkey")
        .collect()
    }
    per_cust = dict.fromkeys(custs, 0)
    for r in (
        load_table(spark, sf_oracle, "orders")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        if r["o_orderpriority"] != "1-URGENT" and r["o_custkey"] in per_cust:
            per_cust[r["o_custkey"]] += 1
    want: dict[int, int] = defaultdict(int)
    for n in per_cust.values():
        want[n] += 1
    got = {
        r["c_count"]: r["custdist"]
        for r in surface49.tpch_q13_cust_distribution(spark, sf_oracle).collect()
    }
    assert got == dict(want)
    # the left join must preserve customers with zero qualifying orders
    assert 0 in got and got[0] > 0


def test_q17_matches_correlated_python(spark, sf_oracle):
    parts = {
        r["p_partkey"]
        for r in load_table(spark, sf_oracle, "part")
        .where("p_brand = 'Brand#23' AND p_type = 'MEDIUM'")
        .collect()
    }
    lines = [
        (r["l_partkey"], int(r["l_quantity"]), int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
        for r in load_table(spark, sf_oracle, "lineitem").collect()
        if r["l_partkey"] in parts
    ]
    sums: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for pk, q, _ in lines:
        sums[pk][0] += q
        sums[pk][1] += 1
    small = [
        c for pk, q, c in lines if 5 * q * sums[pk][1] < sums[pk][0]
    ]
    row = surface49.tpch_q17_small_qty_revenue(spark, sf_oracle).collect()[0]
    assert row["n_small_lines"] == len(small) > 0
    assert row["rev_cents"] == sum(small)
    assert row["avg_yearly_cents"] == sum(small) // 7


def test_attribution_conserves_credit(spark, sf_oracle):
    rows = surface49.event_attribution_linear(spark, sf_oracle).collect()
    ev = [
        (r["user_id"], r["event_id"], r["event_type"], r["ts"])
        for r in load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL")
        .collect()
    ]
    purchases = [(u, i, t) for u, i, ty, t in ev if ty == "purchase"]
    by_user: dict[int, list] = defaultdict(list)
    for u, i, ty, t in ev:
        if ty != "purchase":
            by_user[u].append((t, i, ty))
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, set()])
    touched = 0
    for u, pid, pts in purchases:
        lo = pts - __import__("datetime").timedelta(days=7)
        ts = sorted(t for t in by_user.get(u, ()) if lo <= t[0] < pts)
        if not ts:
            continue
        touched += 1
        n = len(ts)
        for k, (_, _, ty) in enumerate(ts):
            credit = 1000000 // n + (1000000 % n if k == 0 else 0)
            want[ty][0] += credit
            want[ty][1] += 1
            want[ty][2].add(pid)
    got = {
        r["event_type"]: (r["credit_micros"], r["n_touches"], r["n_purchases"])
        for r in rows
    }
    assert got == {
        ty: (v[0], v[1], len(v[2])) for ty, v in want.items()
    }
    # exact conservation: every touched purchase hands out exactly 1e6
    assert sum(r["credit_micros"] for r in rows) == 1000000 * touched


def test_checksum_matches_python_md5(spark, sf_oracle):
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        canon = "|".join(
            [
                str(r["o_orderkey"]),
                str(r["o_custkey"]),
                r["o_orderstatus"],
                str(int(math.floor(r["o_totalprice"] * 100 + 0.5))),
                r["o_orderdate"].strftime("%Y-%m-%d %H:%M:%S"),
                r["o_orderpriority"],
            ]
        )
        h = int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
        acc = want[r["o_orderstatus"]]
        acc[0] += 1
        acc[1] ^= h
        acc[2] += h % 1000000007
    got = {
        r["o_orderstatus"]: (r["n_rows"], r["xor_sig"], r["sum_sig"])
        for r in surface49.audit_table_checksum(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_greedy_wrap_matches_python(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text"
    ).collect()
    want = {}
    for r in docs:
        toks = [t for t in re.split(r"\s+", r["text"].strip()) if t]
        n_lines, mx, cur = 0, 0, 0
        for t in toks:
            cost = cur + (1 if cur > 0 else 0) + len(t)
            if cost <= 40 and n_lines > 0:
                cur = cost
            else:
                n_lines += 1
                mx = max(mx, cur)
                cur = len(t)
        want[r["doc_id"]] = (len(toks), n_lines, max(mx, cur))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_lines"], r["max_line_len"])
        for r in surface49.text_greedy_wrap_lines(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(v[1] > 1 for v in want.values())  # real multi-line docs
