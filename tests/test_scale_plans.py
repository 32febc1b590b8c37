"""Physical-plan assertions (SURVEY.md §5.2-5): the plans the 100 TB design
depends on — pushdown reaching the scan, dims broadcasting, codegen in the
hot path — checked via explain output so regressions are caught."""

from __future__ import annotations

from historic_score_etl_pipeline_spark.contract.joins import (
    join_hash_equi,
    join_multi_hop,
    join_theta_contains,
)
from historic_score_etl_pipeline_spark.contract.scans import scan_parquet
from historic_score_etl_pipeline_spark.contract.joins import sort_limit_topn


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def explain_str(df) -> str:
    # public API: captures the formatted explain text
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown(spark, sf_oracle):
    plan = explain_str(scan_parquet(spark, sf_oracle))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" in plan
    # projection pruned to exactly the 3 selected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_dimension_joins_broadcast(spark, sf_oracle):
    plan = explain_str(join_multi_hop(spark, sf_oracle))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan


def test_fact_join_is_shuffle_join(spark, sf_oracle):
    plan = explain_str(join_hash_equi(spark, sf_oracle))
    # orders fits under the broadcast threshold at sf0.01 (AQE may choose
    # broadcast); the assertion is that SOME hash join strategy is used —
    # never a nested-loop.
    assert "NestedLoop" not in plan
    assert "Join" in plan


def test_theta_join_is_broadcast_nested_loop(spark, sf_oracle):
    plan = explain_str(join_theta_contains(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" in plan


def test_topn_uses_take_ordered(spark, sf_oracle):
    plan = explain_str(sort_limit_topn(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan, plan


def test_whole_stage_codegen_in_scalar_path(spark, sf_oracle):
    from historic_score_etl_pipeline_spark.contract.scans import str_classify_case

    plan = explain_str(str_classify_case(spark, sf_oracle))
    # formatted mode marks codegen stages with "[codegen id : N]"
    assert "codegen id" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
