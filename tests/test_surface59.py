"""Batch-66 behavior: bitmap distinct = exact distinct law, watermark
replay recompute, Luhn recompute + a known-vector check, RLE
recompute, HHI bounds — independent twins."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface59
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_bitmap_distinct_equals_exact(spark, sf_oracle):
    users = defaultdict(set)
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    ):
        users[r["event_type"]].add(r["user_id"])
    got = {
        r["event_type"]: (r["n_words"], r["n_distinct_users"])
        for r in surface59.agg_bitmap_distinct(spark, sf_oracle).collect()
    }
    for ty, us in users.items():
        assert got[ty][1] == len(us)
        assert got[ty][0] == len({u // 32 for u in us})


def test_late_drop_replay_recompute(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        t_us = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        jitter = (
            int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:15], 16)
            % 7_200_000_000
        )
        by_user[r["user_id"]].append(
            (t_us + jitter, r["event_id"], r["event_type"], t_us)
        )
    want = defaultdict(lambda: [0, 0])
    hour_us = 3_600_000_000
    for evs in by_user.values():
        mx = None
        for _, _, ty, t_us in sorted(evs):
            mx = t_us if mx is None else max(mx, t_us)
            if t_us < mx - hour_us:
                want[ty][1] += 1
            else:
                want[ty][0] += 1
    got = {
        r["event_type"]: (r["n_kept"], r["n_dropped"])
        for r in surface59.stream_late_drop_replay(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(v[1] for v in want.values()) > 0  # real late data exists


def _luhn_sum(digits):
    s = 0
    for i, d in enumerate(digits):  # i 0-based from the left, 16 digits
        if (16 - i) % 2 == 0:
            d = d * 2
            if d > 9:
                d -= 9
        s += d
    return s


def test_luhn_matches_python_and_known_vector(spark, sf_oracle):
    # known vector: 4539578763621486 is a valid Luhn number
    assert _luhn_sum([int(c) for c in "4539578763621486"]) % 10 == 0
    want = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        h = hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()
        digits = [int(h[i], 16) % 10 for i in range(16)]
        s = _luhn_sum(digits)
        acc = want[r["o_orderstatus"]]
        acc[0] += 1
        acc[1] += 1 if s % 10 == 0 else 0
        acc[2] += s % 10
    got = {
        r["status"]: (r["n"], r["n_luhn_valid"], r["sum_mod10"])
        for r in surface59.str_luhn_checksum(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # ~10% of arbitrary numbers are Luhn-valid
    assert 0 < sum(v[1] for v in want.values()) < sum(v[0] for v in want.values())


def test_rle_matches_python(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    want = {}
    for u, evs in by_user.items():
        types = [t for _, _, t in sorted(evs)]
        runs = []
        for t in types:
            if runs and runs[-1][0] == t:
                runs[-1][1] += 1
            else:
                runs.append([t, 1])
        best = max(enumerate(runs), key=lambda kv: (kv[1][1], -kv[0]))[1]
        want[u] = (len(runs), len(types), best[1], best[0])
    got = {
        r["user_id"]: (
            r["n_runs"], r["n_events"], r["longest_run"], r["longest_run_type"]
        )
        for r in surface59.event_type_runs_rle(spark, sf_oracle).collect()
    }
    assert got == want
    assert any(v[2] > 1 for v in want.values())  # real multi-event runs


def test_hhi_recompute_and_bounds(spark, sf_oracle):
    bals = defaultdict(list)
    for r in load_table(spark, sf_oracle, "supplier").collect():
        if r["s_acctbal"] > 0:
            bals[r["s_nationkey"]].append(
                int(math.floor(r["s_acctbal"] * 100 + 0.5))
            )
    want = {}
    for nk, bs in bals.items():
        tot = sum(bs)
        shares = [b * 1000000 // tot for b in bs]
        want[nk] = (len(bs), sum(s * s for s in shares) // 1000000)
    got = {
        r["nationkey"]: (r["n_suppliers"], r["hhi_ppm"])
        for r in surface59.agg_hhi_concentration(spark, sf_oracle).collect()
    }
    assert got == want
    # HHI bounds: 1e6/n ≤ HHI ≤ 1e6 (ppm scale, up to floor slack)
    for nk, (n, hhi) in want.items():
        assert hhi <= 1_000_000
        assert hhi >= 1_000_000 // n - n  # floor slack
