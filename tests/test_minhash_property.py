"""Property test: the Column-expression MinHash pipeline (token hashes →
affine shingle combine → aggregate-fold mins) equals an independent pure-
Python reference implementation of the same definition, on arbitrary
text.  Guards the fold rewrite (one traversal, constant-size codegen)
against semantic drift."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from historic_score_etl_pipeline_spark.operators.dedup import (
    _MH_A,
    _MH_B,
    _MH_P,
    minhash_mins,
    shingle_hashes,
    token_hashes,
)

N_HASHES = 16
SHINGLE_N = 3


def _py_minhash(spark, text: str) -> list[int]:
    """Pure-Python mirror of the spec.  The only Spark dependency is
    xxhash64 itself (JVM seed-0 XXH64), resolved per token via a literal
    query so the reference stays independent of the operator under test."""
    toks = text.strip().lower().split() or [""]
    # resolve xxhash64 for each token via literals (not the operator)
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        *[F.xxhash64(F.lit(t)).alias(f"h{i}") for i, t in enumerate(toks)]
    ).first()
    th = [row[f"h{i}"] % _MH_P for i in range(len(toks))]

    n_shingles = max(len(th) - SHINGLE_N, 0) + 1
    base = []
    for i in range(n_shingles):
        acc = th[i] if i < len(th) else 0
        for j in range(1, SHINGLE_N):
            nxt = th[i + j] if i + j < len(th) else 0
            acc = (acc + nxt * _MH_A[j]) % _MH_P
        base.append(acc)
    base = list(dict.fromkeys(base))  # array_distinct keeps first-seen order

    mins = [_MH_P] * N_HASHES
    for h in base:
        for k in range(N_HASHES):
            mins[k] = min(mins[k], (h * _MH_A[k] + _MH_B[k]) % _MH_P)
    return mins


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.text(
        alphabet="ab cd\tx yz THE the quick brown fox 0123",
        min_size=0,
        max_size=80,
    )
)
def test_minhash_fold_matches_python_reference(spark, text):
    from pyspark.sql import functions as F

    got = (
        spark.range(1)
        .select(F.lit(text).alias("t"))
        .select(token_hashes("t").alias("th"))
        .select(shingle_hashes(F.col("th"), SHINGLE_N).alias("base"))
        .select(minhash_mins(F.col("base"), N_HASHES).alias("sig"))
        .first()["sig"]
    )
    assert list(got) == _py_minhash(spark, text)
