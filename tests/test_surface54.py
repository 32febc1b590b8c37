"""Batch-61 behavior: DISTINCT-agg recompute, HRW minimal-movement
law, prefix-vs-full top-k recompute, Wilson bound properties +
boundary margin, aHash pixel-replay — independent twins."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from historic_score_etl_pipeline_spark.contract import surface54
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_sum_distinct_matches_sets(spark, sf_oracle):
    per_flag = defaultdict(set)
    for r in load_table(spark, sf_oracle, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect():
        per_flag[r["l_returnflag"]].add(int(r["l_quantity"]))
    got = {
        r["l_returnflag"]: (
            r["n_distinct_qty"], r["sum_distinct_qty"], r["avg_distinct_milli"]
        )
        for r in surface54.agg_sum_distinct(spark, sf_oracle).collect()
    }
    assert got == {
        f: (len(s), sum(s), sum(s) * 1000 // len(s)) for f, s in per_flag.items()
    }


def _hrw_score(doc_id: int, node: str) -> int:
    return int(hashlib.md5(f"{doc_id}|{node}".encode()).hexdigest()[:15], 16)


def test_rendezvous_matches_and_minimal_movement(spark, sf_oracle):
    got = {
        r["doc_id"]: (r["node"], r["score"])
        for r in surface54.sample_rendezvous_hash(spark, sf_oracle).collect()
    }
    nodes = ["n0", "n1", "n2", "n3", "n4"]
    for did, (node, score) in got.items():
        want = max(((_hrw_score(did, n), n) for n in nodes))
        assert (want[1], want[0]) == (node, score)
    # HRW law: dropping n4 moves ONLY n4's docs
    survivors = nodes[:-1]
    for did, (node, _) in got.items():
        re_best = max(((_hrw_score(did, n), n) for n in survivors))[1]
        if node != "n4":
            assert re_best == node  # untouched
    # and the fixture actually uses every node
    assert {n for n, _ in got.values()} == set(nodes)


def test_prefix_topk_overlap_matches_python(spark, sf_oracle):
    vecs = {
        r["vec_id"]: [
            int(math.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]
        ]
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    queries = {k: v for k, v in vecs.items() if k < 10}
    corpus = {k: v for k, v in vecs.items() if k >= 10}
    want = {}
    for qid, qv in queries.items():
        full = sorted(
            corpus,
            key=lambda c: (-sum(a * b for a, b in zip(qv, vecs[c])), c),
        )[:5]
        pfx = sorted(
            corpus,
            key=lambda c: (-sum(a * b for a, b in zip(qv[:16], vecs[c][:16])), c),
        )[:5]
        want[qid] = (
            ",".join(str(x) for x in sorted(full)),
            ",".join(str(x) for x in sorted(pfx)),
            len(set(full) & set(pfx)),
        )
    got = {
        r["q_id"]: (r["top5_full"], r["top5_prefix"], r["n_overlap"])
        for r in surface54.embed_prefix_topk_overlap(spark, sf_oracle).collect()
    }
    assert got == want


def test_wilson_bound_properties_and_margin(spark, sf_oracle):
    rows = surface54.event_error_rate_wilson(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        n, x = r["n"], r["x"]
        p = x / n
        z, z2 = 1.96, 3.8416
        lb = (
            p + z2 / (2.0 * n) - z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
        ) / (1.0 + z2 / n)
        assert r["wilson_lb_ppm"] == int(math.floor(lb * 1e6 + 0.5))
        # the bound is a LOWER bound, strictly below the point estimate
        assert 0 <= r["wilson_lb_ppm"] < int(p * 1e6) + 1
        # fixpoint boundary margin: not within 1e-6 of a .5 flip
        assert abs((lb * 1e6 + 0.5) % 1 - 0.5) > 1e-6


def _py_ahash(text: str):
    raw = text.encode()
    nb = len(raw)
    w, h = nb % 24 + 8, nb % 16 + 8
    gray = [
        (
            raw[(3 * j) % nb] + raw[(3 * j + 1) % nb] + raw[(3 * j + 2) % nb]
        ) // 3
        if nb
        else 0
        for j in range(w * h)
    ]
    sums = defaultdict(int)
    cnts = defaultdict(int)
    for j, g in enumerate(gray):
        r, c = j // w, j % w
        k = ((r * 8) // h, (c * 8) // w)
        sums[k] += g
        cnts[k] += 1
    cells = {k: sums[k] // cnts[k] for k in sums}
    gmean = sum(cells.values()) // 64
    bits = {k: 1 if v > gmean else 0 for k, v in cells.items()}
    hi = sum(
        1 << (br * 8 + bc - 32)
        for (br, bc), b in bits.items()
        if b and br * 8 + bc >= 32
    )
    lo = sum(
        1 << (br * 8 + bc) for (br, bc), b in bits.items() if b and br * 8 + bc < 32
    )
    return w, h, hi, lo, sum(bits.values())


def test_image_ahash_matches_byte_replay(spark, sf_oracle):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents").collect()
    }
    got = {
        r["media_id"]: (
            r["width"], r["height"], r["ahash_hi"], r["ahash_lo"], r["n_ones"]
        )
        for r in surface54.multimodal_image_ahash(spark, sf_oracle).collect()
    }
    assert got == {d: _py_ahash(t) for d, t in docs.items()}
    # hashes discriminate: not all equal
    assert len({v[2:4] for v in got.values()}) > 1
