"""Batch-74 behavior: concurrency-histogram conservation laws, kNN
bucket-locality + brute recompute, per-file clustering monotonicity,
path-partition recovery, JDN weekday bijection — independent twins."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface67
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_concurrency_histogram_conservation(spark, sf_oracle):
    ev = [
        (r["user_id"], r["ts"], r["event_id"])
        for r in load_table(spark, sf_oracle, "events").collect()
        if r["ts"] is not None and r["user_id"] is not None
    ]
    per_user = defaultdict(list)
    for uid, ts, eid in ev:
        per_user[uid].append(ts)
    got = defaultdict(dict)
    for r in surface67.event_concurrency_duration_histogram(
        spark, sf_oracle
    ).collect():
        got[r["user_id"]][r["level"]] = (r["micros"], r["n_segments"])
    assert set(got) == set(per_user)
    win = 60 * 1_000_000
    for uid, stamps in per_user.items():
        micros = [int(t.timestamp() * 1_000_000) for t in stamps]
        # law 1: sum over levels of k * micros(k) = n_events * 60 s
        total_weighted = sum(k * m for k, (m, _) in got[uid].items())
        assert total_weighted == len(micros) * win
        # law 2: union time = sum of micros across levels, recomputed
        ivals = sorted((m, m + win) for m in micros)
        union = 0
        cur_s, cur_e = ivals[0]
        for s, e in ivals[1:]:
            if s > cur_e:
                union += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        union += cur_e - cur_s
        assert union == sum(m for m, _ in got[uid].values())


def test_knn_graph_brute_recompute(spark, sf_oracle):
    vecs = {
        r["vec_id"]: [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    def bucket(q):
        return (
            (1 if q[0] > 0 else 0)
            + (2 if q[1] > 0 else 0)
            + (4 if q[2] > 0 else 0)
            + (8 if q[3] > 0 else 0)
        )
    by_bucket = defaultdict(list)
    for vid, q in vecs.items():
        by_bucket[bucket(q)].append(vid)
    got = defaultdict(list)
    for r in surface67.embed_knn_graph_octant(spark, sf_oracle).collect():
        got[r["vec_id"]].append((r["rnk"], r["nbr_id"], r["dot"], r["bucket"]))
        # bucket locality: neighbor shares the seed's sign octant
        assert bucket(vecs[r["vec_id"]]) == bucket(vecs[r["nbr_id"]]) == r["bucket"]
    for vid, q in vecs.items():
        peers = [p for p in by_bucket[bucket(q)] if p != vid]
        want = sorted(
            ((sum(a * b for a, b in zip(q, vecs[p])), p) for p in peers),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        rows = sorted(got.get(vid, []))
        assert [(d, p) for _, p, d, _ in rows] == want


def test_clustered_write_per_file_sorted(spark, sf_oracle):
    import glob
    import pyarrow.parquet as pq

    path = surface67._staged_clustered_orders(spark, sf_oracle)
    files = glob.glob(f"{path}/*.parquet")
    assert files
    seen_statuses = set()
    for f in files:
        t = pq.read_table(f, columns=["o_orderstatus", "o_orderdate", "o_orderkey"])
        rows = list(
            zip(
                t.column("o_orderstatus").to_pylist(),
                t.column("o_orderdate").to_pylist(),
                t.column("o_orderkey").to_pylist(),
            )
        )
        assert rows == sorted(rows), f
        seen_statuses.update(s for s, _, _ in rows)
    # all statuses survived the clustering
    src = {
        r["o_orderstatus"]
        for r in load_table(spark, sf_oracle, "orders").collect()
    }
    assert seen_statuses == src


def test_path_partition_day_recovery(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "events").collect():
        if r["ts"] is None:
            continue
        d = r["ts"].strftime("%Y-%m-%d")
        want[d][0] += 1
        want[d][1] += int(math.floor(r["value"] * 100 + 0.5))
    got = {
        r["day"]: (r["n_events"], r["total_cents"])
        for r in surface67.scan_path_date_partition(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_jdn_weekday_bijection(spark, sf_oracle):
    rows = surface67.date_julian_day_number(spark, sf_oracle).collect()
    # the (engine_dow -> jdn_mod7) map is a bijection
    fwd, bwd = {}, {}
    for r in rows:
        fwd.setdefault(r["engine_dow"], r["jdn_mod7"])
        bwd.setdefault(r["jdn_mod7"], r["engine_dow"])
        assert fwd[r["engine_dow"]] == r["jdn_mod7"]
        assert bwd[r["jdn_mod7"]] == r["engine_dow"]
    # anchor: JDN of 1970-01-01 is 2440588, a Thursday
    y, m, d = 1970, 1, 1
    a = (14 - m) // 12
    yy = y + 4800 - a
    mm = m + 12 * a - 3
    jdn = d + (153 * mm + 2) // 5 + 365 * yy + yy // 4 - yy // 100 + yy // 400 - 32045
    assert jdn == 2440588
    # engine_dow 5 = Thursday (Spark: 1=Sunday); its class must be jdn mod 7
    if 5 in fwd:
        assert fwd[5] == jdn % 7
    # spot-check real dates against Python's weekday
    for r in rows:
        # reconstruct a date with that min_jdn: python ordinal = jdn - 1721425
        dte = dt.date.fromordinal(r["min_jdn"] - 1721425)
        py_dow = (dte.weekday() + 1) % 7 + 1  # -> Spark 1=Sunday
        assert py_dow == r["engine_dow"]
