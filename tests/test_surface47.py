"""Batch-54 behavior: range-frame neighborhood vs sorted scan, bit
aggregates vs python fold, affix tables vs Counter, grid-fill
completeness, INTERSECT ALL min-multiplicity law — recompute twins."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from historic_score_etl_pipeline_spark.contract import surface47
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_range_frame_matches_neighborhood_scan(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("value IS NOT NULL AND event_type IS NOT NULL")
        .select("event_id", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 100 + 0.5))
        )
    got = {
        r["event_id"]: (r["cents"], r["n_within_5usd"], r["sum_within_5usd"])
        for r in surface47.window_range_value_frame(spark, sf_oracle).collect()
    }
    for _t, lst in by_type.items():
        cents_sorted = sorted(c for _e, c in lst)
        for eid, c in lst:
            neigh = [x for x in cents_sorted if abs(x - c) <= 500]
            assert got[eid] == (c, len(neigh), sum(neigh)), eid


def test_bit_aggregates_match_python_fold(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("event_type IS NOT NULL")
        .select("event_id", "event_type")
        .collect()
    )
    acc: dict[str, list[int]] = {}
    for r in rows:
        flags = int(
            hashlib.md5(f"flags:{r['event_id']}".encode()).hexdigest()[:4], 16
        )
        a = acc.setdefault(r["event_type"], [0, 0xFFFF, 0, 0])
        a[0] += 1
        a[1] &= flags
        a[2] |= flags
        a[3] ^= flags
    got = {
        r["event_type"]: (r["n"], r["flags_and"], r["flags_or"], r["flags_xor"])
        for r in surface47.agg_bitwise_ops(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in acc.items()}
    # sanity: AND ⊆ XOR-free superset ⊆ OR as bit sets
    for _n, fa, fo, _fx in got.values():
        assert fa & fo == fa


def test_affix_tables_match_counter(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents").select("text").collect()
    toks = [
        t
        for r in docs
        for t in r["text"].strip().lower().split()
        if len(t) >= 5
    ]
    pre_n, pre_ty = Counter(), {}
    suf_n, suf_ty = Counter(), {}
    for t in toks:
        pre_n[t[:3]] += 1
        pre_ty.setdefault(t[:3], set()).add(t)
        suf_n[t[-3:]] += 1
        suf_ty.setdefault(t[-3:], set()).add(t)
    got = {
        (r["side"], r["affix"]): (r["n"], r["n_types"])
        for r in surface47.text_affix_freq(spark, sf_oracle).collect()
    }
    want = {("prefix", a): (n, len(pre_ty[a])) for a, n in pre_n.items()}
    want.update({("suffix", a): (n, len(suf_ty[a])) for a, n in suf_n.items()})
    assert got == want


def test_grid_fill_is_complete_and_zero_correct(spark, sf_oracle):
    rows = surface47.join_dim_grid_fill(spark, sf_oracle).collect()
    regions = {
        r["r_name"] for r in load_table(spark, sf_oracle, "region").collect()
    }
    prios = {
        r["o_orderpriority"]
        for r in load_table(spark, sf_oracle, "orders")
        .select("o_orderpriority")
        .distinct()
        .collect()
    }
    assert {(r["r_name"], r["o_orderpriority"]) for r in rows} == {
        (a, b) for a in regions for b in prios
    }
    n_orders = load_table(spark, sf_oracle, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert r["is_empty_cell"] == (r["n_orders"] == 0)


def test_intersect_all_is_min_multiplicity(spark, sf_oracle):
    orders = (
        load_table(spark, sf_oracle, "orders")
        .select("o_orderstatus", "o_custkey", "o_orderpriority")
        .collect()
    )
    f_cnt = Counter(
        (r["o_custkey"], r["o_orderpriority"])
        for r in orders
        if r["o_orderstatus"] == "F"
    )
    o_cnt = Counter(
        (r["o_custkey"], r["o_orderpriority"])
        for r in orders
        if r["o_orderstatus"] == "O"
    )
    got = {
        (r["o_custkey"], r["o_orderpriority"]): r["multiplicity"]
        for r in surface47.setop_intersect_all(spark, sf_oracle).collect()
    }
    want = {
        k: min(f_cnt[k], o_cnt[k]) for k in f_cnt.keys() & o_cnt.keys()
    }
    assert got == want
    assert got  # real overlap exists in the fixture
