"""Batch 15 tests — recursive CTE semantics, VARIANT typed access,
ORC round-trip fidelity, sessionization invariants, and the runtime
Bloom-filter plan assertion (the part the DuckDB oracle can't see)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract.surface10 import (
    join_bloom_prune,
    json_variant,
    scan_orc,
    sessionize_batch,
    sql_recursive_cte,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_recursive_cte_depth_matches_digit_count(spark, sf_oracle):
    """parent(k) = k div 10 terminates after one step per digit: the
    ancestor row at anc=0 has depth == number of decimal digits."""
    rows = sql_recursive_cte(spark, sf_oracle).collect()
    max_depth = {}
    for r in rows:
        max_depth[r.c_custkey] = max(
            max_depth.get(r.c_custkey, 0), r.depth
        )
    for k, d in max_depth.items():
        expected = len(str(k)) if k > 0 else 0  # k=0 seeds at anc=0: no step
        assert d == expected, (k, d)


def test_variant_extract_matches_string_parse(spark, sf_oracle):
    """variant_get on parse_json(props) must agree with the classic
    get_json_object string path for every row."""
    ev = load_table(spark, sf_oracle, "events").limit(500)
    both = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("vk"),
        F.get_json_object("props", "$.k").cast("int").alias("sk"),
    )
    assert both.where(~F.col("vk").eqNullSafe(F.col("sk"))).count() == 0


def test_orc_roundtrip_preserves_rows_and_schema(spark, sf_oracle, tmp_path):
    docs = load_table(spark, sf_oracle, "documents")
    target = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    # content equality, not just counts
    assert back.exceptAll(docs).count() == 0


def test_sessionize_invariants(spark, sf_oracle):
    """Sessions partition each user's events exactly; no session spans
    a >12h gap and consecutive sessions are separated by >12h."""
    ev = load_table(spark, sf_oracle, "events")
    sess = sessionize_batch(spark, sf_oracle)
    n_events = sess.agg(F.sum("n_events")).collect()[0][0]
    assert n_events == ev.count()
    # session ids are 1..n_sessions per user, dense
    per_user = sess.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = per_user.where(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
    ).count()
    assert bad == 0


def test_bloom_filter_injected_in_plan(spark, sf_oracle):
    """The runtime Bloom filter must appear on the fact side of the
    join — might_contain over a bloom aggregate of the dim keys."""
    plan = explain_str(join_bloom_prune(spark, sf_oracle))
    assert "might_contain" in plan or "bloom" in plan.lower(), plan


def test_variant_group_counts_positive(spark, sf_oracle):
    out = json_variant(spark, sf_oracle)
    assert out.count() > 0
    assert out.where(F.col("n_hot") <= 0).count() == 0


def test_scan_orc_matches_parquet_aggregate(spark, sf_oracle):
    orc_side = scan_orc(spark, sf_oracle).orderBy("lang").collect()
    pq = (
        load_table(spark, sf_oracle, "documents")
        .where(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
        .collect()
    )
    assert orc_side == pq
