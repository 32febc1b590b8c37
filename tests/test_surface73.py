"""Batch-80 behavior: greedy debounce recompute, txn-log skip proof,
CDC class reconciliation, BPE pair recompute, EXECUTE IMMEDIATE twin —
independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface73
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_debounce_greedy_recompute(spark, sf_oracle):
    per_user = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["event_type"] == "error":
            us = int(r["ts"].timestamp() * 1_000_000)
            per_user[r["user_id"]].append((us, r["event_id"]))
    want = {}
    for u, rows in per_user.items():
        rows.sort()
        last = None
        for us, eid in rows:
            fire = last is None or us >= last + 3600 * 1_000_000
            want[(u, eid)] = fire
            if fire:
                last = us
    got = {
        (r["user_id"], r["event_id"]): r["emitted"]
        for r in surface73.event_alert_debounce(spark, sf_oracle).collect()
    }
    assert got == want
    # the greedy invariant: emitted alerts of a user are >= 1h apart
    emitted = defaultdict(list)
    rows_by_key = {
        (u, eid): us for u, lst in per_user.items() for us, eid in lst
    }
    for (u, eid), fire in got.items():
        if fire:
            emitted[u].append(rows_by_key[(u, eid)])
    for times in emitted.values():
        times.sort()
        assert all(b - a >= 3600 * 1_000_000 for a, b in zip(times, times[1:]))


def test_txn_log_fold_skips_removed_file(spark, sf_oracle):
    table_dir = surface73._staged_txn_table(spark, sf_oracle)
    live = surface73._live_files(table_dir)
    names = {p.rsplit("/", 1)[-1] for p in live}
    assert names == {"file_b", "file_c"}  # file_a added then removed
    want = defaultdict(lambda: [0, 0, None, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        if k % 3 in (1, 2):
            a = want[r["o_orderstatus"]]
            a[0] += 1
            a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
            a[2] = k if a[2] is None else min(a[2], k)
            a[3] = k if a[3] is None else max(a[3], k)
    got = {
        r["status"]: (r["n_orders"], r["total_cents"], r["min_key"],
                      r["max_key"])
        for r in surface73.scan_txn_log_table(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_cdc_classes_reconcile(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders").collect()
    n = len(orders)
    n_del = sum(1 for r in orders if r["o_orderkey"] % 13 == 0)
    n_upd = sum(
        1
        for r in orders
        if r["o_orderkey"] % 13 != 0 and r["o_orderkey"] % 11 == 0
    )
    got = {
        r["change"]: (r["n_rows"], r["net_cents_delta"])
        for r in surface73.audit_snapshot_cdc_diff(spark, sf_oracle).collect()
    }
    assert got["deleted"][0] == n_del
    assert got["updated"] == (n_upd, 100 * n_upd)
    assert got["inserted"] == (50, sum(i * 10 + 5 for i in range(50)))
    assert got["unchanged"][0] == n - n_del - n_upd
    assert got["unchanged"][1] == 0
    del_cents = sum(
        int(math.floor(r["o_totalprice"] * 100 + 0.5))
        for r in orders
        if r["o_orderkey"] % 13 == 0
    )
    assert got["deleted"][1] == -del_cents


def test_bpe_pairs_recompute(spark, sf_oracle):
    import re

    wc = Counter()
    for r in load_table(spark, sf_oracle, "documents").collect():
        for w in re.split(r"[^a-z0-9]+", (r["text"] or "").lower()):
            if w:
                wc[w] += 1
    pairs = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += n
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["pair"], r["cnt"])
        for r in surface73.text_bpe_pair_counts(spark, sf_oracle).collect()
    ]
    assert got == want


def test_execute_immediate_equals_static(spark, sf_oracle):
    got = {
        r["status"]: (r["n_orders"], r["n_below"])
        for r in surface73.sql_execute_immediate_param(
            spark, sf_oracle
        ).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        a = want[r["o_orderstatus"]]
        a[0] += 1
        if r["o_totalprice"] < 150000.0:
            a[1] += 1
    assert got == {k: tuple(v) for k, v in want.items()}
