"""Batch-27/28 behavior (contract/surface20.py + surface21.py):
running distinct-count, priority-sampling keys, the JDBC round-trip,
hashed TF, and linear-classifier inference — each against a from-scratch
Python recompute."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface20
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_window_distinct_count_matches_python(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    rows = ev.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["event_id"], r["event_type"])
        )
    expected = {}
    for user, lst in by_user.items():
        lst.sort()
        seen: set[str] = set()
        for _ts, eid, etype in lst:
            seen.add(etype)
            expected[eid] = len(seen)
    got = {
        r["event_id"]: r["n_distinct_types"]
        for r in surface20.window_distinct_count(spark, sf_oracle).collect()
    }
    assert got == expected
    assert max(got.values()) > 1


def test_weighted_sample_matches_es_priorities(spark, sf_oracle):
    """Bit-exact against the from-scratch priority-sampling (u/w) key
    computation, k per language, heavier docs overrepresented relative
    to a uniform sample."""
    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("doc_id", "lang", "n_chars").collect()

    def priority(doc_id: int, w: int) -> int:
        h = int(
            hashlib.md5(
                (surface20._ES_SEED + str(doc_id)).encode()
            ).hexdigest()[:8],
            16,
        )
        return int(math.floor((h + 1.0) / float(w) * 1e9))

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(
            (priority(r["doc_id"], r["n_chars"]), r["doc_id"], r["n_chars"])
        )
    expected = {}
    for lang, lst in by_lang.items():
        lst.sort()
        for rk, (pri, doc_id, w) in enumerate(lst[: surface20._ES_K], 1):
            expected[(doc_id, lang)] = (w, pri, rk)

    got = {
        (r["doc_id"], r["lang"]): (r["weight"], r["priority"], r["rk"])
        for r in surface20.sample_weighted_hash(spark, sf_oracle).collect()
    }
    assert got == expected

    # weight bias: the sampled docs' mean weight exceeds the corpus mean
    # (ES with w=n_chars favors longer docs)
    corpus_mean = sum(r["n_chars"] for r in rows) / len(rows)
    sample_mean = sum(w for w, _p, _r in got.values()) / len(got)
    assert sample_mean > corpus_mean


def test_jdbc_roundtrip_reads_partitioned(spark, sf_oracle):
    """The JDBC read must actually fan out into the 4 range partitions
    (one task each), and the round-trip must be value-lossless."""
    from historic_score_etl_pipeline_spark.contract.surface21 import (
        scan_jdbc_roundtrip, _staged_jdbc_url, _DERBY_DRIVER, _JDBC_KEY_CAP,
    )

    url = _staged_jdbc_url(spark, sf_oracle)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders_stage")
        .option("driver", _DERBY_DRIVER)
        .option("partitionColumn", "o_orderkey")
        .option("lowerBound", "0")
        .option("upperBound", str(_JDBC_KEY_CAP))
        .option("numPartitions", "4")
        .load()
    )
    assert back.rdd.getNumPartitions() == 4
    orig = load_table(spark, sf_oracle, "orders").where(
        F.col("o_orderkey") < _JDBC_KEY_CAP
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    assert scan_jdbc_roundtrip(spark, sf_oracle).count() > 0


def test_hashing_tf_matches_python(spark, sf_oracle):
    """Bucket assignment and term frequencies equal a direct md5
    recompute; total tf mass equals total token count (nothing lost to
    hashing)."""
    import hashlib

    from historic_score_etl_pipeline_spark.contract.surface21 import (
        text_hashing_tf, _HASH_DIM,
    )

    docs = load_table(spark, sf_oracle, "documents")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    expected: dict[tuple[int, int], int] = {}
    n_tokens = 0
    for doc_id, text in rows.items():
        for tok in (t for t in text.split(" ") if t):
            n_tokens += 1
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % _HASH_DIM
            expected[(doc_id, b)] = expected.get((doc_id, b), 0) + 1
    got = {
        (r["doc_id"], r["bucket"]): r["tf"]
        for r in text_hashing_tf(spark, sf_oracle).collect()
    }
    assert got == expected
    assert sum(got.values()) == n_tokens


def test_classifier_linear_matches_python_and_no_join(spark, sf_oracle):
    """z scores equal the direct integer recompute, both verdict classes
    occur, and the physical plan contains NO join — the weight table
    folds in as an expression."""
    import hashlib

    from historic_score_etl_pipeline_spark.contract.surface21 import (
        text_classifier_linear, _HASH_DIM, _W_SCALE, _BIAS_MILLI,
    )

    docs = load_table(spark, sf_oracle, "documents")
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    def weight(bucket: int) -> int:
        h = int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:4], 16)
        return h % _W_SCALE - _W_SCALE // 2

    expected = {}
    for doc_id, text in rows.items():
        tf: dict[int, int] = {}
        for tok in (t for t in text.split(" ") if t):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % _HASH_DIM
            tf[b] = tf.get(b, 0) + 1
        z = _BIAS_MILLI + sum(c * weight(b) for b, c in tf.items())
        expected[doc_id] = (z, z > 0)

    df = text_classifier_linear(spark, sf_oracle)
    got = {r["doc_id"]: (r["z_milli"], r["keep"]) for r in df.collect()}
    assert got == expected
    verdicts = {keep for _z, keep in got.values()}
    assert verdicts == {True, False}

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Join" not in buf.getvalue()


def test_heavy_hitters_exact_on_skewed_data(spark):
    """Adversarial MG exercise: 1000 distinct items >> k=8 counters, one
    item at 30% and one at 12% share — both must be found with EXACT
    counts under any partitioning; nothing below the threshold may
    appear (threshold share 1/8 > MG bound 1/9)."""
    from historic_score_etl_pipeline_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    rows = (
        [("hot",)] * 600 + [("warm",)] * 240
        + [(f"noise_{i % 1000}",) for i in range(1160)]
    )
    items = spark.createDataFrame(rows, "tok string").repartition(7)
    got = {
        r["tok"]: r["n"]
        for r in heavy_hitters_exact(
            items, "tok", k=8, min_share_denom=8
        ).collect()
    }
    # N = 2000, threshold = 250 → hot (600) and warm(240)? 240 < 250 →
    # only hot qualifies; noise items have ≤ 2 occurrences each
    assert got == {"hot": 600}

    got2 = {
        r["tok"]: r["n"]
        for r in heavy_hitters_exact(
            items, "tok", k=8, min_share_denom=5
        ).collect()
    }
    assert got2 == {"hot": 600}  # threshold 400

    import pytest as _pytest
    with _pytest.raises(ValueError):
        heavy_hitters_exact(items, "tok", k=8, min_share_denom=9)
