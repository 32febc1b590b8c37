"""Batch-22 behavior: int8 quantization error bound and temperature-
sampling quota math (contract/surface16.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_quantize_int8_reconstruction_error_bounded(spark, sf_oracle):
    """Dequantized q * scale / 127 must sit within half a quantization
    step (scale/254) of the original, elementwise, for every vector."""
    from historic_score_etl_pipeline_spark.operators.similarity import (
        quantize_int8,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    out = quantize_int8(emb, "embedding")
    rows = out.select("embedding", "q_codes", "q_scale_r6").collect()
    assert rows
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        q = np.asarray(r["q_codes"], dtype=np.float64)
        scale = float(np.abs(x).max())
        assert np.all(np.abs(q) <= 127)
        if scale == 0:
            assert np.all(q == 0)
            continue
        deq = q * scale / 127.0
        # half-step bound plus float slack
        assert np.max(np.abs(deq - x)) <= scale / 254.0 + 1e-9


def test_quantize_plan_is_shuffle_free(spark, sf_oracle):
    from historic_score_etl_pipeline_spark.operators.similarity import (
        quantize_int8,
    )

    emb = load_table(spark, sf_oracle, "embeddings")
    plan = (
        quantize_int8(emb, "embedding")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_sample_temperature_quotas_and_determinism(spark, sf_oracle):
    """Quota per language must equal the alpha-smoothed closed form; the
    selection must be identical across reruns (hash-ordered, no RNG)."""
    from historic_score_etl_pipeline_spark.contract.surface16 import (
        _ALPHA,
        _N_TARGET,
        sample_temperature,
    )

    docs = load_table(spark, sf_oracle, "documents")
    n_by_lang = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    w = {lang: n ** _ALPHA for lang, n in n_by_lang.items()}
    w_sum = sum(w.values())
    expected_quota = {
        lang: max(1, int(np.floor(_N_TARGET * wl / w_sum + 0.5)))
        for lang, wl in w.items()
    }

    picked = sample_temperature(spark, sf_oracle).collect()
    got_by_lang: dict[str, int] = {}
    for r in picked:
        got_by_lang[r["lang"]] = got_by_lang.get(r["lang"], 0) + 1
    # quota is exact unless a language has fewer docs than its quota
    for lang, quota in expected_quota.items():
        assert got_by_lang[lang] == min(quota, n_by_lang[lang])

    again = {(r["doc_id"], r["rk"]) for r in sample_temperature(spark, sf_oracle).collect()}
    assert again == {(r["doc_id"], r["rk"]) for r in picked}


def test_sample_temperature_upsamples_tail(spark, sf_oracle):
    """alpha < 1 must give tail languages a larger sampling RATE than the
    head language (the whole point of temperature mixing)."""
    from historic_score_etl_pipeline_spark.contract.surface16 import (
        sample_temperature,
    )

    docs = load_table(spark, sf_oracle, "documents")
    n_by_lang = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    picked = sample_temperature(spark, sf_oracle).collect()
    got = {}
    for r in picked:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    head = max(n_by_lang, key=n_by_lang.get)
    tail = min(n_by_lang, key=n_by_lang.get)
    if n_by_lang[head] > n_by_lang[tail]:
        assert got[tail] / n_by_lang[tail] > got[head] / n_by_lang[head]


def test_asof_nearest_single_exchange_no_join(spark, sf_oracle):
    """Both direction carries must share one shuffle and one sort —
    zero join operators, one Exchange (plus AQE wrappers), and the two
    frames evaluated inside Window exec(s) over the same partitioning."""
    from historic_score_etl_pipeline_spark.contract.surface16 import (
        join_asof_nearest,
    )

    plan = (
        join_asof_nearest(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    import re

    # exactly one exchange moving data by key (hashpartitioning)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert len(re.findall(r"\bSort \[", plan)) == 1, plan


def test_asof_nearest_semantics_hand_built(spark):
    """Tie → prior; no-prior → forward; no rows → NULL; equal-ts right
    row counts as backward at distance zero."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_nearest_join,
    )

    left = spark.createDataFrame(
        [(1, "k", 100.0), (2, "k", 5.0), (3, "lonely", 50.0)],
        "lid long, key string, lts double",
    ).select(
        "lid", "key", F.timestamp_seconds("lts").alias("lts")
    )
    right = spark.createDataFrame(
        [(10, "k", 90.0), (11, "k", 110.0), (12, "k", 100.0), (13, "k", 2.0)],
        "rid long, key string, rts double",
    ).select(
        "rid", "key", F.timestamp_seconds("rts").alias("rts")
    )
    out = {
        r["lid"]: (r["rid"], r["asof_dir"])
        for r in asof_nearest_join(
            left, right, "key", "lts", "rts", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    # lid=1 at t=100: rid=12 sits exactly at 100 → backward, distance 0
    assert out[1] == (12, "backward")
    # lid=2 at t=5: prior rid=13 at 2 (d=3) vs forward rid=10 at 90 → backward
    assert out[2] == (13, "backward")
    # lid=3: no right rows for key → NULL payload and direction
    assert out[3] == (None, None)

    # pure-forward case: left before every right row
    early = spark.createDataFrame(
        [(9, "k", 1.0)], "lid long, key string, lts double"
    ).select("lid", "key", F.timestamp_seconds("lts").alias("lts"))
    got = asof_nearest_join(
        early, right, "key", "lts", "rts", ["rid"], right_tiebreak="rid"
    ).collect()[0]
    assert got["rid"] == 13 and got["asof_dir"] == "forward"
