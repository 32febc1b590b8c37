"""Batch-77 behavior: the width-parameterized SRP-LSH (VERDICT r8 ask
#1) against a full independent python twin, on a fixture with PLANTED
near-duplicates — the clean generator fixtures contain no hamming ≤ 3
pairs at 4·w ≥ 36 signature bits, so the recall assertion needs its
own bait.  Also pins the width law w = clamp(ceil(log2 n), 4, 24) and
the anti-saturation property the fixed-width sibling measurably lacks
(BASELINE.md §r8-third-batch: exponent 1.885 past bucket saturation)."""

from __future__ import annotations

import hashlib
import math
import os
from functools import lru_cache

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from historic_score_etl_pipeline_spark.contract import surface91
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def _width(n: int) -> int:
    # integer-exact twin of srps_width: bit_length(n-1) == ceil(log2 n)
    # for n ≥ 1, with no libm one-ulp hazard at powers of two (ADVICE r9)
    return max(4, min(24, (max(n, 1) - 1).bit_length()))


@lru_cache(maxsize=None)
def _sign(h: int, i: int) -> int:
    d = int(hashlib.md5(f"hps_{h}_{i}".encode()).hexdigest()[0], 16)
    return 1 if d % 2 == 1 else -1


def _py_band_keys(vec, w: int) -> list[int]:
    q = [int(math.floor(float(x) * 1e6 + 0.5)) for x in vec]
    keys = []
    for b in range(4):
        k = 0
        for j in range(w):
            h = b * w + j
            s = sum(x * _sign(h, i) for i, x in enumerate(q))
            if s > 0:
                k |= 1 << j
        keys.append(k)
    return keys


def _py_scaled_pairs(vecs: dict[int, list]) -> dict[tuple, int]:
    """Full python twin of embed_lsh_hyperplane_scaled."""
    # quarantine-gate twin (ADVICE r9): malformed vectors (NULL, or any
    # NULL element) are dropped BEFORE the width count, like both engines
    vecs = {
        vid: v
        for vid, v in vecs.items()
        if v is not None and all(x is not None for x in v)
    }
    w = _width(len(vecs))
    ks = {vid: _py_band_keys(v, w) for vid, v in vecs.items()}
    buckets: dict[tuple, list] = {}
    for vid, keys in ks.items():
        for b in range(4):
            buckets.setdefault((b, keys[b]), []).append(vid)
    out: dict[tuple, int] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = sum(
                    bin(ka ^ kb).count("1")
                    for ka, kb in zip(ks[a], ks[b])
                )
                if d <= 3:
                    out[(a, b)] = d
    return out


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, spark, sf_oracle) -> str:
    """sf0.01 embeddings + 4 planted rows: two EXACT duplicates of
    existing vectors (hamming 0 — must be recalled) and one
    sign-preserving rescale (projections scale by 1.01 > 0 → identical
    signature when no projection is exactly zero)."""
    rows = (
        load_table(spark, sf_oracle, "embeddings")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    base = [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"]),
         "label": r["label"]}
        for r in rows
    ]
    v0, v1 = base[0]["embedding"], base[1]["embedding"]
    planted = [
        {"vec_id": 9_000_000, "embedding": list(v0), "label": 0},
        {"vec_id": 9_000_001, "embedding": list(v1), "label": 0},
        {"vec_id": 9_000_002,
         "embedding": [x * 1.01 for x in v0], "label": 0},
        # NULL element (ADVICE r9): malformed — the quarantine gate must
        # drop it on both engines and in the twin, NOT let it pair with
        # its source vector
        {"vec_id": 9_000_003,
         "embedding": [None] + list(v1)[1:], "label": 0},
    ]
    out = str(tmp_path_factory.mktemp("planted_lsh"))
    table = pa.Table.from_pylist(
        base + planted,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int64()),
            ]
        ),
    )
    pq.write_table(table, os.path.join(out, "embeddings.parquet"))
    return out


def test_scaled_lsh_matches_python_twin_with_planted_dups(
    spark, planted_dir
):
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, planted_dir, "embeddings").collect()
    }
    want = _py_scaled_pairs(vecs)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in surface91.embed_lsh_hyperplane_scaled(
            spark, planted_dir
        ).collect()
    }
    assert got == want
    # the planted exact duplicates MUST be recalled at hamming 0
    assert got[(0, 9_000_000)] == 0
    assert got[(1, 9_000_001)] == 0
    # the malformed (NULL-element) plant must be quarantined entirely
    assert not any(9_000_003 in p for p in got)


def test_width_law_matches_python(spark):
    from pyspark.sql import functions as F

    # exact powers of two included deliberately: the libm-log2 form this
    # law replaced could flip ceil() by one ulp exactly there (ADVICE r9)
    ns = [1, 2, 15, 16, 17, 500, 1024, 2000, 20_000, 65_536, 200_000,
          1 << 20, 5_000_000, 100_000_000]
    df = spark.createDataFrame([(n,) for n in ns], "n long").select(
        "n", surface91.srps_width(F.col("n")).alias("w")
    )
    got = {r["n"]: r["w"] for r in df.collect()}
    assert got == {n: _width(n) for n in ns}


def _py_shingles2(text: str) -> set[str]:
    import re as _re

    toks = _re.sub(r"^\s+|\s+$", "", text).lower()
    t = _re.split(r"\s+", toks)
    return {
        " ".join(t[i : i + 2]) for i in range(max(len(t) - 1, 1))
    }


def _py_simhash_keys(text: str, w: int) -> list[int]:
    votes = [[0] * w for _ in range(4)]
    for s in _py_shingles2(text):
        hexd = hashlib.md5(f"shs_{s}".encode()).hexdigest()
        for b in range(4):
            word = int(hexd[6 * b : 6 * b + 6], 16)
            for j in range(w):
                votes[b][j] += 1 if (word >> j) & 1 else -1
    return [
        sum(1 << j for j in range(w) if votes[b][j] > 0)
        for b in range(4)
    ]


def test_scaled_simhash_matches_python_twin(spark, sf_oracle):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_oracle, "documents")
        .where("text IS NOT NULL")
        .collect()
    }
    w = _width(len(docs))
    ks = {d: _py_simhash_keys(t, w) for d, t in docs.items()}
    buckets: dict[tuple, list] = {}
    for d, keys in ks.items():
        for b in range(4):
            buckets.setdefault((b, keys[b]), []).append(d)
    want: dict[tuple, int] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                dist = sum(
                    bin(ka ^ kb).count("1")
                    for ka, kb in zip(ks[a], ks[b])
                )
                if dist <= 3:
                    want[(a, b)] = dist
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in surface91.dedup_simhash_scaled(spark, sf_oracle).collect()
    }
    assert got == want
    assert got  # the fixture's real near-dups must surface


def test_width_cap_boundary(spark):
    """Pins behavior AT the 24-bit cap (VERDICT r9 ask #6): the last
    uncapped corpus size, the exact boundary, and corpora past it all
    agree with the python twin, and an empty/NULL corpus count clamps to
    the 4-bit floor instead of diverging (log2(0) crash vs NULL)."""
    from pyspark.sql import functions as F

    ns = [(1 << 23), (1 << 24) - 1, 1 << 24, (1 << 24) + 1, 1 << 30]
    df = spark.createDataFrame([(n,) for n in ns], "n long").select(
        "n", surface91.srps_width(F.col("n")).alias("w")
    )
    got = {r["n"]: r["w"] for r in df.collect()}
    assert got == {n: _width(n) for n in ns}
    assert got[1 << 24] == 24 and got[1 << 30] == 24  # capped
    assert got[(1 << 24) - 1] == 24 and got[1 << 23] == 23
    # empty / NULL corpus count → the 4-bit floor on the Spark side
    edge = spark.createDataFrame([(0,), (None,)], "n long").select(
        surface91.srps_width(F.col("n")).alias("w")
    )
    assert [r["w"] for r in edge.collect()] == [4, 4]


def test_width_law_matches_duckdb_oracle():
    """The oracle's width expression is the SAME integer law — checked
    standalone so a drift between the two SQL blocks and srps_width
    can't hide behind small-corpus clamping."""
    import duckdb

    ns = [0, 1, 2, 16, 17, 1024, 65_536, (1 << 24) - 1, 1 << 24, 1 << 30]
    lst = ", ".join(f"{n}::BIGINT" for n in ns)
    rows = duckdb.sql(
        "SELECT n, GREATEST(4, LEAST(24, CAST(length(bin(GREATEST(n, 1) - 1))"
        f" AS INTEGER))) AS w FROM (SELECT unnest([{lst}]) AS n)"
    ).fetchall()
    assert {n: w for n, w in rows} == {n: _width(n) for n in ns}


def test_bucket_space_tracks_corpus():
    """The anti-saturation law: per-band bucket space 2^w stays ≥ n/2
    up to the 24-bit cap — the property whose absence made the
    fixed-width sibling go ~n² at 5M+ rows."""
    for n in (10, 500, 2000, 20_000, 200_000, 2_000_000, 16_000_000):
        assert 2 ** _width(n) >= n / 2
