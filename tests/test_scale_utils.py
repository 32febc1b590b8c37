"""Scale-utility gates: salting preserves results, bucketing kills the
exchange, parallelism repair is result-neutral."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.operators.scale import (
    ensure_parallelism,
    salted_agg,
    salted_broadcast_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("x_count"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("x_sum"),
            F.min("l_orderkey").alias("x_min"),
            F.max("l_orderkey").alias("x_max"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    salted = (
        salted_agg(
            li,
            ["l_returnflag"],
            {
                "x_count": F.count("*"),
                "x_sum": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
                "x_min": F.min("l_orderkey"),
                "x_max": F.max("l_orderkey"),
            },
            salt_buckets=8,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in salted]


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_broadcast_join(orders, cust, "o_custkey", salt_buckets=4).count()
    assert plain == salted


def test_ensure_parallelism_neutral(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ensure_parallelism(docs, "doc_id")
    assert out.count() == docs.count()
    assert out.rdd.getNumPartitions() >= docs.rdd.getNumPartitions()


def test_bucketed_join_has_no_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", "l_orderkey", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: that's where bucketing pays off
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = _explain(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_stage_landing_zone_restages_on_source_change(spark, tmp_path):
    """The /tmp staged copy survives across rounds but the source testdata
    can be regenerated (its ts type DID change once): a source-file
    signature mismatch must force a restage; an unchanged source must
    reuse the staged copy."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from historic_score_etl_pipeline_spark.sources.catalog import (
        TABLES,
        stage_landing_zone,
    )

    src = tmp_path / "src"
    src.mkdir()
    for name in TABLES:
        pq.write_table(
            pa.table({"x": [1, 2, 3]}), src / f"{name}.parquet"
        )
    out = str(tmp_path / "staged")

    stage_landing_zone(spark, str(src), out, splits=2)
    mtime1 = os.path.getmtime(os.path.join(out, "_STAGED"))

    # unchanged source → no restage (marker untouched)
    stage_landing_zone(spark, str(src), out, splits=2)
    assert os.path.getmtime(os.path.join(out, "_STAGED")) == mtime1

    # regenerate one source table → signature drifts → restage
    pq.write_table(
        pa.table({"x": [9, 9, 9, 9]}), src / "events.parquet"
    )
    stage_landing_zone(spark, str(src), out, splits=2)
    staged_events = spark.read.parquet(os.path.join(out, "events.parquet"))
    assert staged_events.count() == 4
    shutil.rmtree(out)


def test_bucketing_does_not_survive_union(spark):
    """Measured limitation the as-of docs depend on: a window over ONE
    bucketed table needs no exchange, but the union of two same-bucketed
    tables loses the distribution — the union-merge as-of plan's single
    shuffle is inherent, not a missed optimization."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    a = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("t")
    )
    b = spark.range(500).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 2).alias("t")
    )
    try:
        for name, df in (("bk_a", a), ("bk_b", b)):
            df.write.mode("overwrite").bucketBy(8, "k").sortBy("t").format(
                "parquet"
            ).saveAsTable(name)
        w = (
            Window.partitionBy("k")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        single = spark.table("bk_a").withColumn("r", F.sum("t").over(w))
        assert "Exchange" not in _explain(single), _explain(single)

        u = (
            spark.table("bk_a").withColumn("tag", F.lit(1))
            .unionByName(spark.table("bk_b").withColumn("tag", F.lit(0)))
        )
        w2 = (
            Window.partitionBy("k")
            .orderBy("t", "tag")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = u.withColumn("r", F.sum("t").over(w2))
        assert "Exchange" in _explain(merged)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
