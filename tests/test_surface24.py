"""Batch-31 behavior: integer-exact grouped EWMA (the oracle-checkable
§2J-J3 twin) and the IVF oracle upgrade."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import surface24
from historic_score_etl_pipeline_spark.sources.catalog import load_table


def test_grouped_ewma_int_matches_python(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    rows = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    ).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(
            (r["o_orderdate"], r["o_orderkey"], r["o_totalprice"])
        )
    expected = {}
    for cust, lst in by_cust.items():
        lst.sort(key=lambda t: (t[0], t[1]))
        s = None
        for _d, _k, price in lst:
            xm = int(price * 1000 + 0.5)
            s = xm if s is None else (500 * xm + 500 * s) // 1000
        expected[cust] = (s, len(lst))
    got = {
        r["o_custkey"]: (r["ewma_milli"], r["n_steps"])
        for r in surface24.udaf_grouped_ewma_exact(spark, sf_oracle).collect()
    }
    assert got == expected


def test_grouped_ewma_int_hand_sequence(spark):
    """Hand-checkable recurrence: alpha=0.5 milli, floor division at
    each step — including a truncation case (odd sums)."""
    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 0.003), (2, 1, 7.5)],
        "k long, ord long, v double",
    )
    got = {
        r["k"]: (r["ewma_milli"], r["n_steps"])
        for r in surface24.grouped_ewma_int(df, "k", "v", ["ord"]).collect()
    }
    # cust 1: x = [1000, 2000, 3]; s0=1000; s1=(500*2000+500*1000)//1000=1500
    # s2=(500*3+500*1500)//1000 = 751500//1000 = 751
    assert got == {1: (751, 3), 2: (7500, 1)}


def test_grouped_ewma_int_is_single_shuffle_grouped_map(spark, sf_oracle):
    df = surface24.udaf_grouped_ewma_exact(spark, sf_oracle)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in plan
    import re

    # formatted output repeats each node in the detail section — count
    # the numbered node entries, not raw substring hits
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_ivf_contract_schema_and_recall_shape(spark, sf_oracle):
    """The upgraded contract emits the same (query, rank, corpus, cos4)
    shape as the exact twin, ranks are 1..5 per query, and every listed
    neighbour shares the query's probe cells by construction."""
    from historic_score_etl_pipeline_spark.contract.extensions import (
        sim_topk_cosine_ivf,
    )

    out = sim_topk_cosine_ivf(spark, sf_oracle)
    assert out.columns == ["query_id", "rank", "corpus_id", "cos4"]
    rows = out.collect()
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append((r["rank"], r["cos4"]))
    assert set(per_query) == {0, 1, 2}
    for q, lst in per_query.items():
        lst.sort()
        assert [rk for rk, _c in lst] == list(range(1, len(lst) + 1))
        cosines = [c for _rk, c in lst]
        assert cosines == sorted(cosines, reverse=True)
