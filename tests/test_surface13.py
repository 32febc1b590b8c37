"""Batch 18 tests — try_* null semantics, sugar-vs-explicit plan
equivalence, approx-percentile rank-error bound, and plan shapes for
the batch 15/16 operators (single-shuffle as-of, decorrelated LATERAL,
one-shuffle PIVOT/sessionize)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract.surface10 import (
    sessionize_batch,
)
from historic_score_etl_pipeline_spark.contract.surface11 import (
    join_asof_backward,
    join_lateral_topk,
    sql_pivot,
)
from historic_score_etl_pipeline_spark.contract.surface13 import (
    agg_approx_percentile,
    safe_math,
    sql_modern_sugar,
)
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, name: str) -> int:
    """Count physical nodes in formatted explain (tree section lists
    each node once as '(k) Name')."""
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def test_safe_math_nulls_exactly_qty25(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    out = safe_math(spark, sf_oracle)
    per_flag = dict(
        (r.l_returnflag, r)
        for r in out.collect()
    )
    for flag, r in per_flag.items():
        n25 = li.where(
            (F.col("l_returnflag") == flag) & (F.col("l_quantity") == 25.0)
        ).count()
        assert r.n_rows - r.n_divisible == n25, (flag, r)
        # lines 1-3 cast to int, others (flag strings) null out
        n_low = li.where(
            (F.col("l_returnflag") == flag) & (F.col("l_linenumber") <= 3)
        ).count()
        assert r.n_numeric == n_low


def test_sugar_plan_matches_explicit(spark, sf_oracle):
    """GROUP BY ALL + * EXCEPT must optimize to the same plan shape as
    the explicit aggregate — sugar adds zero physical cost."""
    sugar = explain_str(sql_modern_sugar(spark, sf_oracle))
    li = load_table(spark, sf_oracle, "lineitem")
    explicit = explain_str(
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
            F.avg(F.col("l_discount").cast("decimal(18,6)"))
            .cast("double")
            .alias("avg_disc"),
        )
    )
    for node in ("HashAggregate", "Exchange", "Scan parquet"):
        assert n_nodes(sugar, node) == n_nodes(explicit, node), node


def test_approx_percentile_rank_error(spark, sf_oracle):
    """approx p50/p95 must sit within ±1.5% rank of the exact order
    statistics (accuracy=10000 → ~1e-4 design error; wide margin)."""
    li = load_table(spark, sf_oracle, "lineitem")
    for row in agg_approx_percentile(spark, sf_oracle).collect():
        flag = row.l_returnflag
        vals = sorted(
            r[0]
            for r in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, est in zip((0.5, 0.95), (row.approx_p50, row.approx_p95)):
            import bisect

            rank = bisect.bisect_right(vals, est) / n
            assert abs(rank - q) < 0.015, (flag, q, est, rank)


def test_asof_backward_single_wide_shuffle(spark, sf_oracle):
    """Union-merge as-of: exactly one Window pass; the only exchanges
    are the orders pre-aggregation and the window partitioning."""
    plan = explain_str(join_asof_backward(spark, sf_oracle))
    assert n_nodes(plan, "Window") == 1, plan
    assert n_nodes(plan, "Exchange") <= 2, plan
    assert n_nodes(plan, "Sort") <= 2  # agg-side + window sort


def test_lateral_decorrelated_no_nested_loop(spark, sf_oracle):
    plan = explain_str(join_lateral_topk(spark, sf_oracle))
    assert "BroadcastNestedLoop" not in plan, plan
    assert n_nodes(plan, "Window") >= 1  # rank-based top-k


def test_pivot_and_sessionize_one_shuffle_each(spark, sf_oracle):
    # SQL PIVOT plans as (cohort,type) pre-aggregate + cohort pivot
    # aggregate — two exchanges by construction, both key-partitioned.
    pivot_plan = explain_str(sql_pivot(spark, sf_oracle))
    assert n_nodes(pivot_plan, "Exchange") <= 2, pivot_plan
    sess_plan = explain_str(sessionize_batch(spark, sf_oracle))
    assert n_nodes(sess_plan, "Exchange") == 1, sess_plan
    # both windows and the final aggregate share the user partitioning
    assert n_nodes(sess_plan, "Window") <= 2
