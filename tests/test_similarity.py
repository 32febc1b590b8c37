"""Similarity-search gates: brute-force agrees with numpy, IVF recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def test_brute_force_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    qid = int(ids[0])
    q = mat[ids == qid][0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = [
        int(i)
        for i in sorted(
            range(len(ids)), key=lambda i: (-round(cos[i], 6), ids[i])
        )
        if ids[i] != qid
    ][:5]

    out = brute_force_topk(
        emb, emb.where(F.col("vec_id") == qid), "vec_id", "vec_id", k=5
    )
    got = [r.corpus_id for r in out.orderBy("rank").collect()]
    assert got == [ids[i] for i in order]


def test_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, "vec_id", "vec_id", k=5)
    approx = ivf_topk(emb, queries, "vec_id", "vec_id", k=5, n_cells=16, n_probe=8)
    exact_pairs = {(r.query_id, r.corpus_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_kmeans_recall_beats_floor(spark):
    from historic_score_etl_pipeline_spark.operators.similarity import (
        ivf_topk_kmeans,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, "vec_id", "vec_id", k=5)
    approx = ivf_topk_kmeans(
        emb, queries, "vec_id", "vec_id", k=5, n_cells=8, n_probe=3
    )
    exact_pairs = {(r.query_id, r.corpus_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"kmeans-IVF recall too low: {recall}"


def test_valid_vectors_gate_agrees_with_sql_twin(spark):
    """The quarantine-gate law (r10): valid_vectors and VEC_VALID_SQL
    keep/drop the SAME rows for every malformed shape — NULL vector,
    whole-NULL-element, one-NULL-element, empty vector, clean vector.
    The two expressions live in different engines; this pins that they
    can never drift on an edge shape."""
    import duckdb
    import pyarrow as pa

    from historic_score_etl_pipeline_spark.operators.similarity import (
        VEC_VALID_SQL,
        valid_vectors,
    )

    rows = [
        (1, [1.0, 2.0]),        # clean — kept
        (2, None),              # whole-NULL — dropped
        (3, [None, 2.0]),       # leading NULL element — dropped
        (4, [1.0, None]),       # trailing NULL element — dropped
        (5, []),                # empty vector — kept (no NULL in it)
        (6, [0.0, 0.0]),        # zero vector — kept (zeros are values)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got_spark = sorted(
        r["vec_id"] for r in valid_vectors(df).select("vec_id").collect()
    )
    tbl = pa.Table.from_pylist(
        [{"vec_id": i, "embedding": v} for i, v in rows],
        schema=pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
        ),
    )
    con = duckdb.connect()
    con.register("t", tbl)
    pred = VEC_VALID_SQL.format(col="embedding")
    got_sql = sorted(
        r[0]
        for r in con.sql(f"SELECT vec_id FROM t WHERE {pred}").fetchall()
    )
    assert got_spark == got_sql == [1, 5, 6]


def test_quarantine_gate_copies_never_drift_from_canonical():
    """ADVICE r10: the quarantine predicate is hand-copied into many SQL
    oracle blocks.  This pins every copy to the canonical law: any SQL
    line that filters NULL elements out of a list must be EXACTLY
    ``VEC_VALID_SQL`` (modulo the column name).  If the gate law ever
    changes in operators/similarity.py, this fails until every copy is
    re-synced — the copies can no longer drift silently."""
    import re
    from pathlib import Path

    import historic_score_etl_pipeline_spark as pkg
    from historic_score_etl_pipeline_spark.operators.similarity import (
        VEC_VALID_SQL,
    )

    canon = re.compile(
        re.escape(VEC_VALID_SQL.format(col="\x00")).replace(
            "\x00", r"[A-Za-z_][A-Za-z0-9_.]*"
        )
    )
    root = Path(pkg.__file__).resolve().parent
    offenders: list[str] = []
    n_copies = 0
    for p in sorted(root.rglob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), start=1):
            if "{col}" in line:
                continue  # the canonical definition itself
            if "list_filter" in line and "x IS NULL" in line:
                n_copies += 1
                if not canon.search(line):
                    offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, (
        "quarantine-gate copies drifted from VEC_VALID_SQL:\n"
        + "\n".join(offenders)
    )
    assert n_copies >= 15, f"expected the known gate copies, saw {n_copies}"
