"""Batch 16 tests — as-of join semantics vs a naive formulation,
LATERAL top-k invariants, PIVOT totals conservation, null-safe key
pairing, and XML round-trip fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract.surface11 import (
    join_asof_backward,
    join_lateral_topk,
    join_null_safe,
    scan_xml,
    sql_pivot,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_asof_backward_matches_naive_argmax(spark, sf_oracle):
    """The union-merge as-of must equal the naive range-join + argmax
    formulation (which explodes rows and is only viable at test scale)."""
    ev = load_table(spark, sf_oracle, "events")
    orders = load_table(spark, sf_oracle, "orders")
    daily = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_total")
    )
    naive = (
        ev.join(
            daily,
            (ev.user_id == daily.o_custkey) & (daily.o_orderdate <= ev.ts),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.max_by(
                F.col("o_orderdate").cast("string"), F.col("o_orderdate")
            ).alias("asof_date")
        )
    )
    fast = join_asof_backward(spark, sf_oracle).select("event_id", "asof_date")
    diff = (
        fast.alias("f")
        .join(naive.alias("n"), "event_id")
        .where(~F.col("f.asof_date").eqNullSafe(F.col("n.asof_date")))
    )
    assert fast.count() == ev.count()
    assert diff.count() == 0


def test_asof_backward_never_future(spark, sf_oracle):
    out = join_asof_backward(spark, sf_oracle)
    ev = load_table(spark, sf_oracle, "events").select("event_id", "ts")
    joined = out.join(ev, "event_id").where(
        F.col("asof_date").isNotNull()
        & (F.to_timestamp("asof_date") > F.col("ts"))
    )
    assert joined.count() == 0


def test_lateral_topk_per_customer_invariants(spark, sf_oracle):
    out = join_lateral_topk(spark, sf_oracle)
    per_cust = out.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
    )
    assert per_cust.where(F.col("n") > 3).count() == 0
    # every kept order's price >= the customer's 3rd-best cutoff: the
    # kept minimum must dominate every non-kept order of that customer
    orders = load_table(spark, sf_oracle, "orders")
    full3 = per_cust.where(F.col("n") == 3)
    kept_keys = out.select("c_custkey", "o_orderkey")
    viol = (
        orders.join(full3, orders.o_custkey == full3.c_custkey)
        .join(kept_keys, ["c_custkey", "o_orderkey"], "left_anti")
        .where(F.col("o_totalprice") > F.col("lo"))
    )
    assert viol.count() == 0


def test_pivot_conserves_totals(spark, sf_oracle):
    out = sql_pivot(spark, sf_oracle)
    n_cols = [c for c in out.columns if c.endswith("_n")]
    total = out.select(
        sum(F.sum(c) for c in [F.col(c) for c in n_cols]).alias("t")
    ).collect()[0]["t"]
    assert total == load_table(spark, sf_oracle, "events").count()


def test_null_safe_join_pairs_null_keys(spark, sf_oracle):
    out = join_null_safe(spark, sf_oracle).collect()
    null_rows = [r for r in out if r.k is None]
    assert len(null_rows) == 1
    li = load_table(spark, sf_oracle, "lineitem")
    n_null_even = li.where(
        (F.col("l_returnflag") == "N") & (F.col("l_orderkey") % 2 == 0)
    ).count()
    assert null_rows[0].cnt_even == n_null_even
    assert null_rows[0].cnt_even > 0 and null_rows[0].cnt_odd > 0


def test_xml_roundtrip_rows(spark, sf_oracle, tmp_path):
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    target = str(tmp_path / "docs_xml")
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(target)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT")
        .load(target)
    )
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0


def test_scan_xml_groups(spark, sf_oracle):
    out = scan_xml(spark, sf_oracle)
    assert out.where(F.col("n_docs") <= 0).count() == 0
    assert out.count() > 0


def test_asof_backward_null_payload_field_survives(spark):
    """The matched right row's actual NULL fields must survive: a
    per-column last(ignorenulls) would backfill them from an OLDER right
    row, mixing payload values across right rows.  The packed-struct
    carry keeps all payload columns from the single matched row."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_backward_join,
    )

    right = spark.createDataFrame(
        [
            ("k1", 1, "old_a", "old_b"),
            ("k1", 5, None, "new_b"),  # latest prior row: a IS NULL
        ],
        "k string, t int, a string, b string",
    )
    left = spark.createDataFrame([("k1", 10)], "k string, t int")
    row = asof_backward_join(left, right, "k", "t", "t", ["a", "b"]).first()
    assert row["b"] == "new_b"
    assert row["a"] is None, "NULL field was backfilled from an older row"


def test_asof_backward_no_prior_row_gives_all_nulls(spark):
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_backward_join,
    )

    right = spark.createDataFrame(
        [("k1", 50, "x", "y")], "k string, t int, a string, b string"
    )
    left = spark.createDataFrame([("k1", 10)], "k string, t int")
    row = asof_backward_join(left, right, "k", "t", "t", ["a", "b"]).first()
    assert row["a"] is None and row["b"] is None


def test_asof_forward_rejects_string_tiebreak(spark):
    """A string tiebreak would negate to NULL silently, so the forward
    as-of validates and raises instead."""
    import pytest

    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_forward_join,
    )

    ts = "2024-01-01 00:00:00"
    right = spark.createDataFrame(
        [("k1", ts, "idA", "p")], "k string, t string, tb string, a string"
    ).withColumn("t", F.to_timestamp("t"))
    left = spark.createDataFrame([("k1", ts)], "k string, t string").withColumn(
        "t", F.to_timestamp("t")
    )
    with pytest.raises(TypeError, match="non-orderable-by-negation"):
        asof_forward_join(left, right, "k", "t", "t", ["a"], right_tiebreak="tb")
    # numeric tiebreak still works
    ok = asof_forward_join(
        left,
        right.withColumn("tbn", F.lit(7)),
        "k",
        "t",
        "t",
        ["a"],
        right_tiebreak="tbn",
    )
    assert ok.first()["a"] == "p"
