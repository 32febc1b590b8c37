"""Round-4 batch 31 — oracle upgrades for the grouped-map UDAF row.

``udaf_grouped_ewma`` (contract/surface.py) is rows-only by design: its
pandas ``ewm(...)`` recursion is float arithmetic with no ANSI-SQL twin.
This module adds the EXACT sibling that closes SURVEY §2J-J3's oracle
gap: the same applyInPandas grouped-map dataflow, but with the
recurrence fixpointed to integer milli-units and floor division —

    s_0 = x_0m
    s_t = (alpha_m · x_tm + (1000 − alpha_m) · s_{t−1}) div 1000

Every step is integer-exact, so the result is bit-identical across
engines, partitionings, and retries — and the DuckDB twin can replay
the recursion with a recursive CTE (one join per step, depth = the
longest per-customer history).  The oracle's per-step recursion is
O(depth · |customers|) — fine at oracle scale and a nice inverse of the
usual story: here the ENGINE's formulation (one Arrow batch per group)
is also the scalable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table

_ALPHA_MILLI = 500  # alpha = 0.5 in milli-units


def grouped_ewma_int(
    df: DataFrame,
    key: str,
    value: str,
    order: list[str],
    alpha_milli: int = _ALPHA_MILLI,
) -> DataFrame:
    """Integer-exact grouped EWMA via applyInPandas (SURVEY §2J-J3).

    One shuffle on ``key``; Arrow ships each group once; inside the
    group the recurrence runs over Python ints (arbitrary precision, no
    float surface).  Emits the FINAL smoothed value per key in
    milli-units plus the step count.
    """
    import pandas as pd

    out_schema = f"{key} long, ewma_milli long, n_steps long"

    def ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order)
        s = None
        for x in pdf["xm"]:
            x = int(x)
            s = x if s is None else (alpha_milli * x + (1000 - alpha_milli) * s) // 1000
        return pd.DataFrame(
            {
                key: [int(pdf[key].iloc[0])],
                "ewma_milli": [int(s)],
                "n_steps": [len(pdf)],
            }
        )

    from pyspark.sql import functions as F

    staged = df.select(
        key,
        *order,
        F.floor(F.col(value) * F.lit(1000) + F.lit(0.5))
        .cast("long")
        .alias("xm"),
    )
    return staged.groupBy(key).applyInPandas(ewma, out_schema)


def udaf_grouped_ewma_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact EWMA of each customer's order totals in
    (date, key) order — the oracle-checkable twin of
    ``udaf_grouped_ewma`` (same grouped-map applyInPandas shape, same
    single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return grouped_ewma_int(
        orders,
        key="o_custkey",
        value="o_totalprice",
        order=["o_orderdate", "o_orderkey"],
    )


UDAF_GROUPED_EWMA_EXACT_SQL = f"""
WITH RECURSIVE base AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT) AS xm,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
), steps AS (
  SELECT o_custkey, rn, xm AS s FROM base WHERE rn = 1
  UNION ALL
  SELECT b.o_custkey, b.rn,
         ({_ALPHA_MILLI} * b.xm + (1000 - {_ALPHA_MILLI}) * e.s) // 1000
  FROM steps e JOIN base b
    ON b.o_custkey = e.o_custkey AND b.rn = e.rn + 1
), finals AS (
  SELECT o_custkey, s, rn,
         row_number() OVER (PARTITION BY o_custkey ORDER BY rn DESC) AS rk
  FROM steps
)
SELECT o_custkey, CAST(s AS BIGINT) AS ewma_milli, CAST(rn AS BIGINT) AS n_steps
FROM finals WHERE rk = 1
"""


QUERIES: dict[str, QuerySpec] = {
    "udaf_grouped_ewma_exact": QuerySpec(
        udaf_grouped_ewma_exact, UDAF_GROUPED_EWMA_EXACT_SQL
    ),
}
