"""Batch-83 behavior: packed-record roundtrip, Shapley credit law,
Sankey edge recompute, downsample pair recompute, hint honoring —
independent twins."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface76
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_packed_records_roundtrip(spark, sf_oracle):
    import glob
    import struct

    path = surface76._staged_packed_records(spark, sf_oracle)
    # the staged bytes genuinely carry 16-byte <qq records
    blobs = sorted(glob.glob(f"{path}/*.bin"))
    assert len(blobs) == 4
    n_recs = sum(len(open(b, "rb").read()) for b in blobs) // 16
    want = defaultdict(lambda: [0, 0, None, None])
    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r["o_orderkey"]
        a = want[k % 5]
        a[0] += 1
        a[1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
        a[2] = k if a[2] is None else min(a[2], k)
        a[3] = k if a[3] is None else max(a[3], k)
    assert n_recs == sum(v[0] for v in want.values())
    got = {
        r["bucket"]: (r["n"], r["total_cents"], r["min_key"], r["max_key"])
        for r in surface76.scan_binary_packed_records(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # spot-check record byte layout; the hash-partitioned shard write
    # sends each k%4 residue to exactly ONE shard file (two residues may
    # share a file, but no residue may straddle two)
    residue_sets = []
    for b in blobs:
        raw = open(b, "rb").read()
        if not raw:
            continue
        _, c0 = struct.unpack("<qq", raw[:16])
        assert c0 > 0
        residue_sets.append(
            {
                struct.unpack("<qq", raw[i : i + 16])[0] % 4
                for i in range(0, len(raw), 16)
            }
        )
    assert sorted(x for s in residue_sets for x in s) == [0, 1, 2, 3]


def test_shapley_credit_conserved(spark, sf_oracle):
    per = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "events").collect():
        a = per[r["user_id"]]
        if r["event_type"] == "click":
            a[0] = 1
        elif r["event_type"] == "view":
            a[1] = 1
        elif r["event_type"] == "purchase":
            a[2] = 1
    conv = [(c, v) for c, v, p in per.values() if p]
    cells = Counter(conv)
    got = {
        r["channel"]: (r["solo_converters"], r["shared_converters"],
                       r["credit_x2"])
        for r in surface76.event_attribution_shapley(
            spark, sf_oracle
        ).collect()
    }
    assert got["click"] == (
        cells[(1, 0)], cells[(1, 1)], 2 * cells[(1, 0)] + cells[(1, 1)],
    )
    assert got["view"] == (
        cells[(0, 1)], cells[(1, 1)], 2 * cells[(0, 1)] + cells[(1, 1)],
    )
    assert got["organic"] == (cells[(0, 0)], 0, 2 * cells[(0, 0)])
    # credit conservation: Σ credit = 2 × converters
    assert sum(v[2] for v in got.values()) == 2 * len(conv)


def test_sankey_edges_recompute(spark, sf_oracle):
    seqs = defaultdict(list)
    for r in load_table(spark, sf_oracle, "events").collect():
        seqs[(r["user_id"], r["ts"].date())].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    want = Counter()
    for rows in seqs.values():
        rows.sort()
        for step, ((_, _, a), (_, _, b)) in enumerate(
            zip(rows, rows[1:]), start=1
        ):
            if step <= 4:
                want[(step, a, b)] += 1
    got = {
        (r["step"], r["src"], r["dst"]): r["n"]
        for r in surface76.event_path_sankey_edges(spark, sf_oracle).collect()
    }
    assert got == dict(want)


def test_downsample_pairs_recompute(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, sf_oracle, "documents").collect():
        raw = (r["text"] or "").encode("utf-8")
        nb = len(raw)
        n = nb % 441 + 100
        s = [((raw[j % nb] - 128) * 256 if nb else 0) for j in range(n)]
        pairs = [s[2 * j] + s[2 * j + 1] for j in range(n // 2)]
        a = want[r["source"]]
        a[0] += 1
        a[1] += len(pairs)
        a[2] += sum(abs(p) for p in pairs)
        a[3] = max(a[3], max(abs(p) for p in pairs) if pairs else 0)
    got = {
        r["source"]: (r["n_clips"], r["n_out"], r["sum_abs_pair"],
                      r["max_abs_pair"])
        for r in surface76.multimodal_audio_downsample_2x(
            spark, sf_oracle
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_join_hints_honored(spark, sf_oracle):
    import contextlib
    import io

    df = surface76.sql_join_strategy_hints(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" in plan, plan
    # both strategies return identical rows
    rows = df.collect()
    by = defaultdict(dict)
    for r in rows:
        by[r["strategy"]][r["nat"]] = (r["n_orders"], r["cents"])
    assert by["shuffle_hash"] == by["merge"]
