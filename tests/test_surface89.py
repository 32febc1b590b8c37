"""Batch-96 behavior: Latin-1 survival, snapshot recompute, unit-audit
reconciliation, escape roundtrip law, manifest verification law —
independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface89
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_latin1_survives(spark, sf_oracle):
    import glob

    path = surface89._staged_latin1_csv(spark, sf_oracle)
    raw = b"".join(
        open(p, "rb").read() for p in sorted(glob.glob(f"{path}/*.csv"))
    )
    assert b"\xe9" in raw  # the files genuinely hold ISO-8859-1 bytes
    assert b"\xc3\xa9" not in raw  # and NOT utf-8
    want = Counter()
    acc = Counter()
    for r in load_table(spark, sf_oracle, "orders").collect():
        label = (
            f"café_{r['o_orderstatus']}"
            if r["o_orderkey"] % 13 == 0
            else r["o_orderstatus"]
        )
        want[label] += 1
        if "é" in label:
            acc[label] += 1
    got = {
        r["label"]: (r["n"], r["n_accented"])
        for r in surface89.scan_csv_latin1_charset(spark, sf_oracle).collect()
    }
    assert got == {k: (n, acc[k]) for k, n in want.items()}


def test_snapshot_recompute(spark, sf_oracle):
    li = defaultdict(lambda: [None, None, 0])
    for r in load_table(spark, sf_oracle, "lineitem").collect():
        d = r["l_shipdate"]
        d = d.date() if hasattr(d, "date") else d
        a = li[r["l_orderkey"]]
        a[0] = d if a[0] is None else min(a[0], d)
        a[1] = d if a[1] is None else max(a[1], d)
        a[2] += 1
    want = defaultdict(lambda: [0, 0, None, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        if k not in li:
            continue
        od = r["o_orderdate"]
        od = od.date() if hasattr(od, "date") else od
        first, last, n = li[k]
        a = want[f"{od.year:04d}-{od.month:02d}"]
        a[0] += 1
        a[1] += (first - od).days
        span = (last - od).days  # can be NEGATIVE in the synthetic data
        a[2] = span if a[2] is None else max(a[2], span)
        a[3] += n
    got = {
        r["ym"]: (r["n_orders"], r["sum_lag_days"], r["max_span_days"],
                  r["n_lines"])
        for r in surface89.join_accumulating_snapshot(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_unit_audit_reconciles(spark, sf_oracle):
    rows = surface89.date_epoch_unit_audit(spark, sf_oracle).collect()
    by_unit = defaultdict(dict)
    for r in rows:
        by_unit[r["unit"]][r["dn"]] = r["n"]
    # both unit classes exist and cover the SAME calendar days
    assert set(by_unit) == {"ms", "us"}
    assert set(by_unit["ms"]) == set(by_unit["us"])
    # per-day totals equal the raw per-day event counts
    daily = Counter()
    for r in load_table(spark, sf_oracle, "events").collect():
        us = int(r["ts"].timestamp() * 1_000_000)
        daily[us // 86_400_000_000] += 1
    for dn, n in daily.items():
        assert by_unit["ms"].get(dn, 0) + by_unit["us"].get(dn, 0) == n


def test_escape_roundtrip_law(spark, sf_oracle):
    got = {
        r["o_orderstatus"]: (r["n"], r["n_roundtrip_exact"])
        for r in surface89.str_json_escape_roundtrip(
            spark, sf_oracle
        ).collect()
    }
    want = Counter()
    for r in load_table(spark, sf_oracle, "orders").collect():
        want[r["o_orderstatus"]] += 1
    # EVERY crafted payload roundtrips exactly
    assert got == {k: (n, n) for k, n in want.items()}


def test_manifest_verification_law(spark, sf_oracle):
    import hashlib

    rows = surface89.sink_write_with_manifest(spark, sf_oracle).collect()
    got = {r["shard"]: (r["actual_rows"], r["verified"]) for r in rows}
    shards = defaultdict(list)
    for r in load_table(spark, sf_oracle, "orders").collect():
        shards[r["o_orderkey"] % 4].append(r["o_orderkey"])
    assert set(got) == set(shards)
    for sid, keys in shards.items():
        assert got[sid] == (len(keys), True)
    # independent digest check of one shard: replay the order-insensitive
    # fold (bit_xor + modular sum of 60-bit md5 prefixes) in pure Python
    path = surface89._staged_manifest_write(spark, sf_oracle)
    import json

    manifest = json.load(open(f"{path}/_manifest.json"))
    hs = [
        int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        for k in shards[0]
    ]
    xor = 0
    for h in hs:
        xor ^= h
    assert manifest["0"]["xor_sig"] == xor
    from historic_score_etl_pipeline_spark.functions.digests import (
        DIGEST_MOD,
    )

    assert manifest["0"]["sum_sig"] == sum(h % DIGEST_MOD for h in hs)
