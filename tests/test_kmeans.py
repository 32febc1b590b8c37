"""Iterative-algorithm gate (SURVEY.md §2K-K3 coarse quantizer): the
DataFrame Lloyd's loop equals a numpy reference step for step."""

from __future__ import annotations

import numpy as np

from historic_score_etl_pipeline_spark.operators.similarity import kmeans_lite
from historic_score_etl_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
K, ITERS = 4, 3


def _numpy_kmeans(ids: np.ndarray, X: np.ndarray):
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    cent = X[:K].copy()
    for _ in range(ITERS):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # first-wins ties, same as array_position
        for c in range(K):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return dict(zip(ids.tolist(), assign.tolist())), cent


def test_kmeans_lite_matches_numpy(spark):
    emb = load_table(spark, SF, "embeddings")
    centroids, assigned = kmeans_lite(emb, "vec_id", "embedding", k=K, iters=ITERS)

    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    expected_assign, expected_cent = _numpy_kmeans(ids, X)

    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    mismatches = sum(1 for i, c in got.items() if expected_assign[i] != c)
    assert mismatches == 0, f"{mismatches}/{len(got)} assignments differ"
    np.testing.assert_allclose(np.array(centroids), expected_cent, rtol=1e-9)
