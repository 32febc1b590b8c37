"""Grouped-map UDAF gate (SURVEY.md §2J-J3): the distributed
applyInPandas EWMA equals a single-process pandas groupby-apply."""

from __future__ import annotations

from historic_score_etl_pipeline_spark.operators.aggregates import grouped_ewma
from historic_score_etl_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_grouped_ewma_matches_pandas(spark):
    orders = load_table(spark, SF, "orders")
    got = (
        grouped_ewma(
            orders,
            key="o_custkey",
            value="o_totalprice",
            order=["o_orderdate", "o_orderkey"],
            alpha=0.5,
        )
        .toPandas()
        .set_index("o_custkey")["ewma"]
        .sort_index()
    )

    pdf = orders.select(
        "o_custkey", "o_totalprice", "o_orderdate", "o_orderkey"
    ).toPandas()
    expected = (
        pdf.sort_values(["o_orderdate", "o_orderkey"])
        .groupby("o_custkey")["o_totalprice"]
        .apply(lambda s: s.ewm(alpha=0.5, adjust=False).mean().iloc[-1])
        .sort_index()
    )
    assert len(got) == len(expected)
    assert (got - expected).abs().max() < 1e-9
