"""Batch-52 behavior: 15-min buckets vs epoch arithmetic, nested JSON
field recovery, CTE share arithmetic + single-scan plan, rank-variant
tie laws, A/B split determinism — recompute twins."""

from __future__ import annotations

import hashlib
import math

from historic_score_etl_pipeline_spark.contract import surface45
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_tumbling_15min_matches_epoch_arith(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .selectExpr(
            "CAST(unix_timestamp(ts) AS BIGINT) AS es", "event_type", "value"
        )
        .collect()
    )
    want: dict[tuple, list[int]] = {}
    for r in rows:
        cell = want.setdefault((r["es"] // 900, r["event_type"]), [0, 0])
        cell[0] += 1
        cell[1] += math.floor((r["value"] or 0.0) * 100 + 0.5)
    got = {
        (r["bucket_15m"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in surface45.window_tumbling_15min(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # buckets span multiple days at 15-minute granularity
    assert len({b for b, _t in got}) > 96


def test_nested_json_recovers_fields(spark, sf_oracle):
    got = {
        (r["doc_id"], r["pos"]): (r["lang"], r["source"], r["tok"])
        for r in surface45.scan_json_nested_explode(spark, sf_oracle).collect()
    }
    docs = load_table(spark, sf_oracle, "documents").collect()
    n_expected = 0
    for d in docs:
        toks = d["text"].strip().lower().split()[:5]
        n_expected += len(toks)
        for i, t in enumerate(toks):
            assert got[(d["doc_id"], i)] == (d["lang"], d["source"], t)
    assert len(got) == n_expected


def test_cte_share_sums_to_million_and_single_scan(spark, sf_oracle):
    import contextlib
    import io

    df = surface45.sql_cte_share_of_total(spark, sf_oracle)
    rows = df.collect()
    total = sum(r["total_cents"] for r in rows)
    for r in rows:
        assert r["share_ppm"] == r["total_cents"] * 1_000_000 // total
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000
    # the window formulation scans the base exactly once (count unique
    # NUMBERED nodes — the formatted detail section repeats names)
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert len(set(re.findall(r"\(\d+\) Scan parquet", buf.getvalue()))) == 1


def test_rank_variant_tie_laws(spark, sf_oracle):
    rows = surface45.window_rank_variants(spark, sf_oracle).collect()
    by_part: dict[str, list] = {}
    for r in rows:
        by_part.setdefault(r["o_orderstatus"], []).append(r)
    for status, lst in by_part.items():
        lst.sort(key=lambda r: (r["o_orderpriority"], r["o_orderkey"]))
        assert [r["rn"] for r in lst] == list(range(1, len(lst) + 1))
        seen_prio: dict[str, tuple] = {}
        for r in lst:
            p = r["o_orderpriority"]
            if p not in seen_prio:
                # tie-group head: rank == row_number; dense rank is the
                # number of distinct priorities so far
                assert r["rnk"] == r["rn"], status
                assert r["drnk"] == len(seen_prio) + 1
                seen_prio[p] = (r["rnk"], r["drnk"])
            else:
                assert (r["rnk"], r["drnk"]) == seen_prio[p]


def test_ab_split_matches_md5_parity(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    )
    conv: dict[int, int] = {}
    for r in rows:
        conv[r["user_id"]] = max(
            conv.get(r["user_id"], 0),
            1 if r["event_type"] == "purchase" else 0,
        )
    want: dict[str, list[int]] = {"A": [0, 0], "B": [0, 0]}
    for u, c in conv.items():
        arm = (
            "A"
            if int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15], 16) % 2
            == 0
            else "B"
        )
        want[arm][0] += 1
        want[arm][1] += c
    got = {
        r["arm"]: (r["n_users"], r["n_converted"], r["conv_ppm"])
        for r in surface45.event_ab_test_lift(spark, sf_oracle).collect()
    }
    assert got == {
        arm: (n, c, c * 1_000_000 // n) for arm, (n, c) in want.items()
    }
    # the md5 split is near-balanced on the fixture
    na, nb = got["A"][0], got["B"][0]
    assert abs(na - nb) < 0.3 * (na + nb)
