"""Batch-91 behavior: reconciliation recompute, duration roundtrip,
leakage recompute, clamped balance recompute + clamp law, CRLF
cleanliness — independent twins."""

from __future__ import annotations

import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface84
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_reconcile_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        jitter = k % 3 - 1
        a = want[jitter]
        a[0] += 1
        if abs(jitter) <= 1:  # always true — every payment matches
            a[1] += 1
            a[2] += abs(jitter)
    got = {
        r["jitter"]: (r["n_payments"], r["n_matched"], r["sum_abs_delta"])
        for r in surface84.join_reconcile_tolerance(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # the banded probe really found every |Δ| ≤ 1 pair
    assert all(v[0] == v[1] for v in got.values())


def test_duration_roundtrip(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        secs = (k % 5) * 86400 + (k % 24) * 3600
        a = want[r["o_orderstatus"]]
        a[0] += 1
        a[1] += secs
        a[2] = max(a[2], secs)
    got = {
        r["o_orderstatus"]: (r["n"], r["total_seconds"], r["max_seconds"])
        for r in surface84.str_iso_duration_parse(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_leakage_recompute(spark, sf_oracle):
    train_u = defaultdict(set)
    test_u = defaultdict(set)
    n_tr = defaultdict(int)
    n_te = defaultdict(int)
    for r in load_table(spark, sf_oracle, "events").collect():
        t = r["event_type"]
        if r["ts"].day > 15:
            test_u[t].add(r["user_id"])
            n_te[t] += 1
        else:
            train_u[t].add(r["user_id"])
            n_tr[t] += 1
    got = {
        r["event_type"]: (r["n_train_events"], r["n_test_events"],
                          r["n_test_users"], r["n_leaked_users"],
                          r["leak_ppm"])
        for r in surface84.sample_time_group_split_audit(
            spark, sf_oracle
        ).collect()
    }
    for t in test_u:
        leak = len(train_u[t] & test_u[t])
        assert got[t] == (
            n_tr[t], n_te[t], len(test_u[t]), leak,
            leak * 1000000 // len(test_u[t]),
        )


def test_clamped_balance_recompute(spark, sf_oracle):
    per = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"]
        d = d.date() if hasattr(d, "date") else d
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        flow = cents if r["o_orderkey"] % 2 == 0 else -cents
        per[r["o_custkey"]].append((d, r["o_orderkey"], flow))
    want = {}
    for ck, rows in per.items():
        rows.sort()
        bal = clamps = 0
        for _, _, f in rows:
            bal += f
            if bal < 0:
                bal = 0
                clamps += 1
        want[ck] = (len(rows), bal, clamps)
    got = {
        r["o_custkey"]: (r["n_flows"], r["final_balance"], r["n_clamps"])
        for r in surface84.window_clamped_running_balance(
            spark, sf_oracle
        ).collect()
    }
    assert got == want
    # the clamp genuinely fired somewhere (odd keys subtract)
    assert any(v[2] > 0 for v in got.values())
    assert all(v[1] >= 0 for v in got.values())


def test_crlf_clean(spark, sf_oracle):
    import glob

    path = surface84._staged_crlf_csv(spark, sf_oracle)
    raw = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(f"{path}/*.csv"))
    )
    assert b"\r\n" in raw  # staged files really are CRLF
    # every record line ends \r\n (no bare-\n lines)
    assert raw.count(b"\n") == raw.count(b"\r\n")
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        r["status"]: (r["n"], r["n_bad_cents"], r["total_cents"])
        for r in surface84.scan_csv_crlf_endings(spark, sf_oracle).collect()
    }
    assert got == {k: (v[0], 0, v[1]) for k, v in want.items()}
