"""Batch 17 tests — map-HOF semantics, Arrow UDF plan + value parity,
Z-order file clustering, and Observation metrics."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract.surface12 import (
    hof_map_pipeline,
    udf_arrow_native,
)
from historic_score_etl_pipeline_spark.observability import (
    event_quality_checks,
    with_quality_metrics,
)
from historic_score_etl_pipeline_spark.operators.scale import (
    write_sorted_ranges,
    write_zordered,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_hof_map_pipeline_matches_direct_agg(spark, sf_oracle):
    out = hof_map_pipeline(spark, sf_oracle)
    direct = (
        load_table(spark, sf_oracle, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("tv"))
        .where(F.col("tv") > 100)
        .select(
            "user_id",
            "event_type",
            (F.col("tv") * 2).cast("double").alias("boosted"),
        )
    )
    assert out.count() == direct.count() > 0
    assert out.exceptAll(direct).count() == 0


def test_arrow_udf_plan_and_empty_text(spark, sf_oracle):
    plan = explain_str(udf_arrow_native(spark, sf_oracle))
    assert "ArrowEvalPython" in plan, plan
    # Python split() semantics on edge strings
    from historic_score_etl_pipeline_spark.contract.surface12 import (
        _py_token_count,
    )
    assert _py_token_count(None) == 0
    assert _py_token_count("") == 0
    assert _py_token_count("  a\t\nb  ") == 2


def test_zorder_keeps_both_columns_clustered(spark, sf_oracle, tmp_path):
    """Per-file min/max spans must stay tight on BOTH z-ordered columns;
    a plain single-column sort leaves the second column unclustered —
    that's the data-skipping gap z-ordering closes."""
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "plain_sort")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=8)
    write_sorted_ranges(li, spath, "l_partkey", num_ranges=8)

    def mean_spans(path: str) -> dict[str, float]:
        df = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        lo = {c: r for c, r in zip(
            ("l_partkey", "l_suppkey"),
            df.agg(F.min("l_partkey"), F.min("l_suppkey")).collect()[0],
        )}
        hi = {c: r for c, r in zip(
            ("l_partkey", "l_suppkey"),
            df.agg(F.max("l_partkey"), F.max("l_suppkey")).collect()[0],
        )}
        spans = df.groupBy("f").agg(
            *(
                (
                    (F.max(c) - F.min(c))
                    / F.lit(float(hi[c] - lo[c]))
                ).alias(c)
                for c in ("l_partkey", "l_suppkey")
            )
        )
        row = spans.agg(
            F.avg("l_partkey").alias("p"), F.avg("l_suppkey").alias("s")
        ).collect()[0]
        return {"l_partkey": row["p"], "l_suppkey": row["s"]}

    z = mean_spans(zpath)
    plain = mean_spans(spath)
    # plain sort: leading column tightly clustered, second column ~full span
    assert plain["l_partkey"] < 0.3
    assert plain["l_suppkey"] > 0.85
    # z-order: BOTH columns clustered well below full span
    assert z["l_partkey"] < 0.75, z
    assert z["l_suppkey"] < 0.75, z


def test_zorder_preserves_rows(spark, sf_oracle, tmp_path):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = str(tmp_path / "z2")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0
    assert set(back.columns) == set(li.columns)


def test_observation_counts_match_direct(spark, sf_oracle):
    ev = load_table(spark, sf_oracle, "events")
    observed, obs = with_quality_metrics(ev, event_quality_checks())
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n == ev.count()
    assert got["null_user"] == ev.where(F.col("user_id").isNull()).count()
    assert got["negative_value"] == ev.where(F.col("value") < 0).count()
    assert (
        got["bad_props"]
        == ev.where(
            F.col("props").isNull()
            | F.get_json_object("props", "$.k").isNull()
        ).count()
    )


def test_observation_single_pass_no_extra_job(spark, sf_oracle):
    """The metrics ride the SAME action: after one count() the metrics
    are present without any further job."""
    ev = load_table(spark, sf_oracle, "events").limit(100)
    observed, obs = with_quality_metrics(
        ev, {"neg": F.col("value") < 0}
    )
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n_rows"] == 100
