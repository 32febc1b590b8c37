"""Batch-27 behavior: running distinct-count against a Python recompute
and ES weighted sampling against a from-scratch priority recompute
(contract/surface20.py)."""

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
    """Bit-exact against the from-scratch Efraimidis–Spirakis priority
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
        u = (h + 1.0) / surface20._ES_DENOM
        return int(math.floor(-math.log(u) / float(w) * 1e9))

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
