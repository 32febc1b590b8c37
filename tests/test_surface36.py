"""Batch-43 behavior: harmonic mean vs Fraction-exact recompute,
trimmed mean vs sorted-slice, weighted median vs sequential scan,
entropy vs math.log recompute, grouping_id bit conventions."""

from __future__ import annotations

import math

from historic_score_etl_pipeline_spark.contract import surface36
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _event_cents(spark, sf):
    rows = (
        load_table(spark, sf, "events")
        .where("value IS NOT NULL")
        .select("event_type", "event_id", "value")
        .collect()
    )
    return [
        (r["event_type"], r["event_id"], math.floor(r["value"] * 100 + 0.5))
        for r in rows
    ]


def test_harmonic_mean_matches_integer_recompute(spark, sf_oracle):
    got = {
        r["event_type"]: (r["n"], r["recip_fp_sum"], r["hm_cents_r6"])
        for r in surface36.agg_harmonic_mean(spark, sf_oracle).collect()
    }
    by_type: dict[str, list[int]] = {}
    for t, _eid, c in _event_cents(spark, sf_oracle):
        if c > 0:
            by_type.setdefault(t, []).append(c)
    assert set(got) == set(by_type)
    for t, cs in by_type.items():
        rsum = sum((2_000_000_000_000 + c) // (2 * c) for c in cs)
        hm = round(len(cs) * 1e12 / rsum, 6)
        assert got[t] == (len(cs), rsum, hm)
        # sanity: the fixpointed HM is within 1e-4 of the true HM
        true_hm = len(cs) / sum(1.0 / c for c in cs)
        assert abs(hm - true_hm) < 1e-4 * max(true_hm, 1.0)


def test_trimmed_mean_matches_sorted_slice(spark, sf_oracle):
    got = {
        r["event_type"]: (
            r["n_total"],
            r["n_kept"],
            r["kept_sum_cents"],
            r["trimmed_mean_r4"],
        )
        for r in surface36.agg_trimmed_mean(spark, sf_oracle).collect()
    }
    by_type: dict[str, list[tuple[int, int]]] = {}
    for t, eid, c in _event_cents(spark, sf_oracle):
        by_type.setdefault(t, []).append((c, eid))
    for t, lst in by_type.items():
        lst.sort()
        n = len(lst)
        k = n // 10
        kept = [c for c, _ in lst[k : n - k]]
        want = (
            n,
            len(kept),
            sum(kept),
            round(sum(kept) / (100.0 * len(kept)), 4),
        )
        assert got[t] == want, t
        # trimming must actually drop 2k elements
        assert n - len(kept) == 2 * k


def test_weighted_median_matches_sequential_scan(spark, sf_oracle):
    got = {
        r["l_returnflag"]: (r["total_qty"], r["wmedian_cents"])
        for r in surface36.agg_weighted_median(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "lineitem")
        .select(
            "l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_quantity",
        )
        .collect()
    )
    by_flag: dict[str, list[tuple]] = {}
    for r in rows:
        cents = math.floor(r["l_extendedprice"] * 100 + 0.5)
        qty = math.floor(r["l_quantity"] + 0.5)
        by_flag.setdefault(r["l_returnflag"], []).append(
            (cents, r["l_orderkey"], r["l_linenumber"], qty)
        )
    for flag, lst in by_flag.items():
        lst.sort()
        total = sum(q for *_k, q in lst)
        cum = 0
        med = None
        for cents, _ok, _ln, q in lst:
            cum += q
            if 2 * cum >= total:
                med = cents
                break
        assert got[flag] == (total, med), flag


def test_entropy_matches_math_log(spark, sf_oracle):
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["h_fp"])
        for r in surface36.event_user_type_entropy(spark, sf_oracle).collect()
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
        n = sum(d.values())
        h = sum(
            c * math.floor(math.log(n / c) * 1e6 + 0.5) for c in d.values()
        )
        assert got[u] == (n, len(d), h)
        # entropy bounds: 0 <= H <= n * ln(|types|) (in the same fixpoint)
        assert 0 <= h <= n * math.log(max(len(d), 2)) * 1e6 + n


def test_grouping_id_bit_conventions(spark, sf_oracle):
    rows = surface36.sql_grouping_id(spark, sf_oracle).collect()
    leafs = [r for r in rows if r["gid"] == 0]
    subtotals = [r for r in rows if r["gid"] == 1]
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    assert len(subtotals) == 5  # one per region
    assert {r["r_name"] for r in subtotals} == {
        r["r_name"] for r in leafs
    }
    assert all(r["n_name"] is None for r in subtotals)
    g = grand[0]
    assert g["r_name"] is None and g["n_name"] is None
    # additivity: leaf counts/balances roll up exactly
    assert g["n_custs"] == sum(r["n_custs"] for r in leafs)
    assert g["bal_cents"] == sum(r["bal_cents"] for r in leafs)
    for s in subtotals:
        mine = [r for r in leafs if r["r_name"] == s["r_name"]]
        assert s["n_custs"] == sum(r["n_custs"] for r in mine)
        assert s["bal_cents"] == sum(r["bal_cents"] for r in mine)
    # gid 2 (region-null, nation-set) cannot appear in a rollup
    assert not [r for r in rows if r["gid"] == 2]
