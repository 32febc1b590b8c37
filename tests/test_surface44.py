"""Batch-51 behavior: cohort LTV vs dict recompute, feature hash vs
hashlib, variance merge algebra, from_csv quote handling, FK audit
ground truth — recompute twins."""

from __future__ import annotations

import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface44
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _events(spark, sf):
    return (
        load_table(spark, sf, "events")
        .where(
            "ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL"
        )
        .selectExpr(
            "user_id", "event_id", "event_type", "CAST(ts AS DATE) AS day",
            "value",
        )
        .collect()
    )


def test_cohort_ltv_matches_dict_recompute(spark, sf_oracle):
    rows = _events(spark, sf_oracle)
    first: dict[int, object] = {}
    for r in rows:
        if r["user_id"] not in first or r["day"] < first[r["user_id"]]:
            first[r["user_id"]] = r["day"]
    cell: dict[tuple, list] = {}
    for r in rows:
        d0 = first[r["user_id"]]
        cw = (d0 - __import__("datetime").timedelta(days=d0.weekday())).strftime(
            "%Y-%m-%d"
        )
        off = (r["day"] - d0).days // 7
        c = cell.setdefault((cw, off), [set(), 0])
        c[0].add(r["user_id"])
        c[1] += math.floor(r["value"] * 100 + 0.5)
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_users"], r["rev_cents"], r["ltv_cents"]
        )
        for r in surface44.event_cohort_ltv(spark, sf_oracle).collect()
    }
    assert set(got) == set(cell)
    ltv: dict[str, int] = {}
    for (cw, off) in sorted(cell):
        users, cents = cell[(cw, off)]
        ltv[cw] = ltv.get(cw, 0) + cents
        assert got[(cw, off)] == (len(users), cents, ltv[cw]), (cw, off)


def test_feature_assembly_hash_matches_hashlib(spark, sf_oracle):
    rows = [r for r in _events(spark, sf_oracle) if r["event_type"]]
    horizon = max(r["day"] for r in rows)
    per: dict[int, dict] = {}
    for r in rows:
        p = per.setdefault(
            r["user_id"],
            {"n": dict.fromkeys(surface44._FEAT_TYPES, 0), "last": r["day"],
             "cents": 0},
        )
        if r["event_type"] in p["n"]:
            p["n"][r["event_type"]] += 1
        p["last"] = max(p["last"], r["day"])
        p["cents"] += math.floor(r["value"] * 100 + 0.5)
    got = {
        r["user_id"]: r
        for r in surface44.event_feature_assembly(spark, sf_oracle).collect()
    }
    assert set(got) == set(per)
    for u, p in per.items():
        rec = (p["last"], (horizon - p["last"]).days)
        g = got[u]
        for t in surface44._FEAT_TYPES:
            assert g[f"n_{t}"] == p["n"][t], (u, t)
        assert g["recency_days"] == rec[1]
        assert g["total_cents"] == p["cents"]
        csv = ",".join(
            [str(u)]
            + [str(p["n"][t]) for t in surface44._FEAT_TYPES]
            + [str(rec[1]), str(p["cents"])]
        )
        assert g["feat_hash"] == hashlib.md5(csv.encode()).hexdigest()


def test_variance_merge_is_exact_everywhere(spark, sf_oracle):
    rows = surface44.agg_variance_merge_proof(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["merge_exact"] is True
        assert r["var_num_merged"] == r["var_num_direct"]
        assert r["var_num_direct"] >= 0  # n·Σx² ≥ (Σx)² (Cauchy–Schwarz)


def test_from_csv_recovers_quoted_fields(spark, sf_oracle):
    got = {
        r["o_orderkey"]: (
            r["parsed_key"], r["parsed_note"], r["parsed_cents"], r["key_ok"]
        )
        for r in surface44.str_from_csv_parse(spark, sf_oracle).collect()
    }
    rows = (
        load_table(spark, sf_oracle, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    assert len(got) == len(rows) > 0
    for r in rows:
        want = (
            r["o_orderkey"],
            f"prio is, {r['o_orderpriority']}",  # embedded comma survived
            math.floor(r["o_totalprice"] * 100 + 0.5),
            True,
        )
        assert got[r["o_orderkey"]] == want


def test_fk_audit_matches_set_difference(spark, sf_oracle):
    got = {
        r["relationship"]: (r["n_child"], r["n_orphan"])
        for r in surface44.audit_fk_orphans(spark, sf_oracle).collect()
    }
    li = load_table(spark, sf_oracle, "lineitem").select("l_orderkey").collect()
    orders = load_table(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    cust = load_table(spark, sf_oracle, "customer").select(
        "c_custkey", "c_nationkey"
    ).collect()
    nat = {r["n_nationkey"] for r in load_table(spark, sf_oracle, "nation").collect()}
    okeys = {r["o_orderkey"] for r in orders}
    ckeys = {r["c_custkey"] for r in cust}
    assert got["lineitem->orders"] == (
        len(li),
        sum(1 for r in li if r["l_orderkey"] not in okeys),
    )
    assert got["orders->customer"] == (
        len(orders),
        sum(1 for r in orders if r["o_custkey"] not in ckeys),
    )
    assert got["customer->nation"] == (
        len(cust),
        sum(1 for r in cust if r["c_nationkey"] not in nat),
    )
