"""Batch-63 behavior: BFS tier recompute, audio frame replay +
whole-signal law, glob/corrupt scan equivalence to clean reads,
interval-union vs brute minute-set — independent twins."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface56
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_bfs_2hop_matches_python(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    deg_sorted = sorted(adj, key=lambda u: (-len(adj[u]), u))
    seeds = deg_sorted[:3]
    want = {}
    for s in seeds:
        d1 = adj[s] - {s}
        d2 = set()
        for n in d1:
            d2 |= adj[n]
        d2 -= d1 | {s}
        want[s] = (len(d1), len(d2))
    got = {
        r["seed"]: (r["n_hop1"], r["n_hop2"])
        for r in surface56.graph_bfs_2hop(spark, sf_oracle).collect()
    }
    assert got == want
    assert all(h2 > 0 for _, h2 in want.values())


def test_audio_frames_replay_and_total_energy(spark, sf_oracle):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    got = defaultdict(dict)
    for r in surface56.multimodal_audio_frame_rms(spark, sf_oracle).collect():
        got[r["media_id"]][r["frame_idx"]] = (
            r["n_samples"], r["energy"], r["peak"]
        )
    for did, text in docs.items():
        raw = text.encode()
        nb = len(raw)
        n = nb % 441 + 100
        s = [((raw[j % nb] - 128) * 256) if nb else 0 for j in range(n)]
        frames = got[did]
        assert sum(f[0] for f in frames.values()) == n  # partition law
        for f, (cnt, energy, peak) in frames.items():
            fr = s[f * 64 : f * 64 + 64]
            assert cnt == len(fr)
            assert energy == sum(x * x for x in fr)
            assert peak == max(abs(x) for x in fr)


def _clean_orders_agg(spark, sf_oracle, key):
    agg = defaultdict(lambda: [0, 0])
    import math

    for r in load_table(spark, sf_oracle, "orders").collect():
        k = r[key]
        agg[k][0] += 1
        agg[k][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    return {k: tuple(v) for k, v in agg.items()}


def test_recursive_glob_sees_exactly_parquet(spark, sf_oracle):
    got = {
        r["status"]: (r["n"], r["sum_cents"])
        for r in surface56.scan_recursive_glob(spark, sf_oracle).collect()
    }
    assert got == _clean_orders_agg(spark, sf_oracle, "o_orderstatus")


def test_corrupt_file_is_skipped(spark, sf_oracle):
    got = {
        r["priority"]: (r["n"], r["sum_cents"])
        for r in surface56.scan_ignore_corrupt_files(spark, sf_oracle).collect()
    }
    assert got == _clean_orders_agg(spark, sf_oracle, "o_orderpriority")


def test_interval_union_matches_brute_sweep(spark, sf_oracle):
    by_type = defaultdict(list)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("ts IS NOT NULL AND event_type IS NOT NULL")
        .select("event_type", "ts")
        .collect()
    ):
        by_type[r["event_type"]].append(r["ts"])
    want = {}
    half_hour = dt.timedelta(minutes=30)
    for ty, starts in by_type.items():
        ivs = sorted((t, t + half_hour) for t in starts)
        covered = dt.timedelta(0)
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
        covered += cur_e - cur_s
        want[ty] = int(covered.total_seconds() * 1_000_000)
    got = {
        r["event_type"]: r["covered_us"]
        for r in surface56.event_interval_union_time(spark, sf_oracle).collect()
    }
    assert got == want
    # union < sum of interval lengths (real overlap merged)
    for ty, starts in by_type.items():
        assert got[ty] < len(starts) * 30 * 60 * 1_000_000
