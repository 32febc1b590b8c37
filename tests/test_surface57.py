"""Batch-64 behavior: manifest pruning, fiscal mapping, Benford
shares, SRM identity, PQ encode replay — independent twins."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface57
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_manifest_reads_exactly_listed_shards(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        if r["o_orderkey"] % 4 in (1, 3):
            want[r["o_orderstatus"]][0] += 1
            want[r["o_orderstatus"]][1] += int(
                math.floor(r["o_totalprice"] * 100 + 0.5)
            )
    got = {
        r["status"]: (r["n"], r["sum_cents"])
        for r in surface57.scan_manifest_subset(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}


def test_fiscal_year_boundaries(spark, sf_oracle):
    want = defaultdict(lambda: [0, 0])
    for r in load_table(spark, sf_oracle, "orders").collect():
        d = r["o_orderdate"].date()
        fy = d.year + (1 if d.month >= 7 else 0)
        fq = ((d.month - 7) % 12) // 3 + 1
        want[(fy, fq)][0] += 1
        want[(fy, fq)][1] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    got = {
        (r["fiscal_year"], r["fiscal_quarter"]): (r["n_orders"], r["sum_cents"])
        for r in surface57.date_fiscal_year_rollup(spark, sf_oracle).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # July and June of one calendar year land in different fiscal years
    assert any(k[1] == 1 for k in want) and any(k[1] == 4 for k in want)


def test_benford_shares_sum_and_match(spark, sf_oracle):
    rows = surface57.audit_benford_first_digit(spark, sf_oracle).collect()
    counts = defaultdict(int)
    for r in load_table(spark, sf_oracle, "orders").collect():
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        counts[int(str(cents)[0])] += 1
    total = sum(counts.values())
    got = {r["digit"]: (r["n"], r["share_ppm"], r["benford_ppm"]) for r in rows}
    for d, n in counts.items():
        assert got[d][0] == n
        assert got[d][1] == n * 1000000 // total
    assert got[1][2] == 301030  # Benford's 30.1% for digit 1
    assert set(got) <= set(range(1, 10))


def test_srm_chi2_identity(spark, sf_oracle):
    rows = surface57.event_ab_srm_check(spark, sf_oracle).collect()
    seen = set()
    want = defaultdict(lambda: [0, 0])
    for r in (
        load_table(spark, sf_oracle, "events")
        .where("user_id IS NOT NULL AND event_type IS NOT NULL")
        .select("user_id", "event_type")
        .collect()
    ):
        k = (r["user_id"], r["event_type"])
        if k in seen:
            continue
        seen.add(k)
        b = int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:15], 16) % 2
        want[r["event_type"]][b] += 1
    for r in rows:
        n0, n1 = want[r["event_type"]]
        assert (r["n0"], r["n1"]) == (n0, n1)
        assert r["chi2_micro"] == (n0 - n1) ** 2 * 1000000 // (n0 + n1)
        # a healthy 50/50 split: chi2 under the p=0.001 cutoff (10.83)
        assert r["chi2_micro"] < 10_830_000


def _pq_cent(b, c, i):
    h = int(hashlib.md5(f"pq_{b}_{c}_{i}".encode()).hexdigest()[:15], 16)
    return h % 2000001 - 1000000


def test_pq_encode_matches_python(spark, sf_oracle):
    vecs = {
        r["vec_id"]: [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    cents = {
        (b, c): [_pq_cent(b, c, i) for i in range(8)]
        for b in range(8)
        for c in range(4)
    }
    want = {}
    for vid, q in vecs.items():
        codes, err = [], 0
        for b in range(8):
            dists = [
                sum(
                    (q[b * 8 + i] - cents[(b, c)][i]) ** 2 for i in range(8)
                )
                for c in range(4)
            ]
            m = min(dists)
            codes.append(str(dists.index(m)))
            err += m
        want[vid] = (",".join(codes), err)
    got = {
        r["vec_id"]: (r["pq_code"], r["recon_err"])
        for r in surface57.embed_pq_encode(spark, sf_oracle).collect()
    }
    assert got == want
    # codes are non-trivial: more than one distinct codeword appears
    assert len({v[0] for v in want.values()}) > 1
