"""Batch-59 behavior: CSV quoting losslessness, exact-N stratified
sample, trigram paths, isocalendar law, relational division —
independent python twins."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from historic_score_etl_pipeline_spark.contract import surface52
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_csv_roundtrip_fingerprint_lossless(spark, sf_oracle):
    want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        note = (
            f'p:"{r["o_orderpriority"]}",{r["o_orderstatus"]}'
            f"\nk={r['o_orderkey']}"
        )
        acc = want[r["o_orderstatus"]]
        acc[0] += 1
        acc[1] += len(note)
        acc[2] ^= _h15(note)
    got = {
        r["status"]: (r["n"], r["sum_len"], r["xor_sig"])
        for r in surface52.sink_csv_quoting_roundtrip(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_stratified_topn_exact_n_and_order(spark, sf_oracle):
    ev = [
        (r["event_id"], r["event_type"])
        for r in load_table(spark, sf_oracle, "events")
        .where("event_type IS NOT NULL")
        .select("event_id", "event_type")
        .collect()
    ]
    by_type = defaultdict(list)
    for eid, ty in ev:
        by_type[ty].append(eid)
    want = {}
    for ty, ids in by_type.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rn, eid in enumerate(ranked[:100], start=1):
            want[eid] = (ty, rn)
    got = {
        r["event_id"]: (r["event_type"], r["rn"])
        for r in surface52.sample_stratified_topn(spark, sf_oracle).collect()
    }
    assert got == want
    per_type = Counter(ty for ty, _ in got.values())
    assert all(n == 100 for n in per_type.values())


def test_trigrams_match_python(spark, sf_oracle):
    rows = (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", "event_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts: Counter = Counter()
    for seq in by_user.values():
        types = [t for _, _, t in sorted(seq)]
        for i in range(len(types) - 2):
            counts[">".join(types[i : i + 3])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["path"], r["n"])
        for r in surface52.event_sequence_trigrams(spark, sf_oracle).collect()
    ]
    assert got == want


def test_iso_week_matches_isocalendar(spark, sf_oracle):
    want: dict[tuple, list] = {}
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"].date()
        iy, iw, _ = d.isocalendar()
        k = (iy, iw)
        if k not in want:
            want[k] = [0, d, d]
        want[k][0] += 1
        want[k][1] = min(want[k][1], d)
        want[k][2] = max(want[k][2], d)
    got = {
        (r["iso_year"], r["iso_week"]): (
            r["n_orders"], r["first_day"], r["last_day"]
        )
        for r in surface52.date_iso_week_boundary(spark, sf_oracle).collect()
    }
    assert got == {
        k: (v[0], v[1].strftime("%Y-%m-%d"), v[2].strftime("%Y-%m-%d"))
        for k, v in want.items()
    }
    # the law is only exercised if some ISO year differs from the
    # calendar year of a contained date
    assert any(
        k[0] != d.year
        for k, (_, d, _2) in ((k, (v[0], v[1], v[2])) for k, v in want.items())
    )


def test_relational_division_matches_sets(spark, sf_oracle):
    pairs_by_user = defaultdict(set)
    all_pairs = set()
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", "event_type", "ts")
        .collect()
    ):
        k = (r["event_type"], r["ts"].date().isocalendar()[1])
        pairs_by_user[r["user_id"]].add(k)
        all_pairs.add(k)
    want = {
        u: len(ps) for u, ps in pairs_by_user.items() if ps == all_pairs
    }
    got = {
        r["user_id"]: r["n_pairs"]
        for r in surface52.sql_relational_division(spark, sf_oracle).collect()
    }
    assert got == want
    # division is only meaningful if SOME but not ALL users qualify
    assert 0 < len(want) < len(pairs_by_user)
