"""Contract batch 18 — ANSI error-safe expressions, modern SQL sugar,
and sketch-based percentiles.

* ``safe_math`` — ORACLE-CHECKED ``try_divide`` / ``try_cast``: the
  engine's ANSI-mode-safe spelling of the reference's cast-or-skip
  control flow (``int(item)`` under try/except,
  ``app/team_utilities.py:82-88`` — SURVEY.md §2C-C8).  Errors become
  NULLs that aggregate away instead of killing a 100 TB job at task
  4913 of 80000.
* ``sql_modern_sugar`` — ORACLE-CHECKED ``GROUP BY ALL`` + ``SELECT *
  EXCEPT (...)``: parser-level ergonomics over a plain aggregate; the
  optimized plan is identical to the explicit form.
* ``agg_approx_percentile`` — rows-only: ``approx_percentile`` (KLL-ish
  quantile summary).  Estimates are engine-specific so there is no
  hash oracle; the rank-error bound against the exact percentile is
  unit-tested (tests/test_surface13.py).  The scale story mirrors HLL:
  mergeable partial summaries, map-side combine, one small state blob
  per group instead of a sort of the whole column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from historic_score_etl_pipeline_spark.contract import QuerySpec
from historic_score_etl_pipeline_spark.sources.catalog import load_table


# --- try_* error-safe expressions --------------------------------------------


def safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division that hits zero denominators and casts that hit
    non-numeric strings — both survive as NULLs and drop out of the
    aggregates.  try_divide(x, qty-25) nulls exactly the qty=25 rows;
    try_cast covers the reference's garbage-token tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    td = F.try_divide(
        F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25.0)
    )
    mixed = F.when(
        F.col("l_linenumber") <= 3, F.col("l_linenumber").cast("string")
    ).otherwise(F.col("l_returnflag"))
    tc = mixed.try_cast("int")
    # floor(td*1000) → integer units: the divide/multiply/floor chain is
    # bit-identical IEEE in every engine and the integer sum is exact —
    # double→decimal conversion is NOT engine-stable (Spark converts the
    # shortest decimal representation, DuckDB the scaled product).
    return (
        li.select(
            "l_returnflag",
            F.floor(td * 1000).alias("td_milli"),
            tc.alias("tc"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("td_milli").alias("n_divisible"),
            F.sum("td_milli").alias("sum_ratio_milli"),
            F.count("tc").alias("n_numeric"),
            F.sum("tc").alias("sum_numeric"),
        )
    )


SAFE_MATH_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       count(td_milli) AS n_divisible,
       CAST(sum(td_milli) AS BIGINT) AS sum_ratio_milli,
       count(tc) AS n_numeric,
       CAST(sum(tc) AS BIGINT) AS sum_numeric
FROM (
  SELECT l_returnflag,
         CAST(floor((l_extendedprice / nullif(l_quantity - 25.0, 0)) * 1000)
              AS BIGINT) AS td_milli,
         TRY_CAST(CASE WHEN l_linenumber <= 3
                       THEN CAST(l_linenumber AS VARCHAR)
                       ELSE l_returnflag END AS INT) AS tc
  FROM lineitem
)
GROUP BY l_returnflag
"""


# --- GROUP BY ALL + SELECT * EXCEPT ------------------------------------------


def sql_modern_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL infers the grouping keys from the non-aggregate
    select items; the outer ``* EXCEPT`` drops a helper column without
    re-listing the rest.  Sugar only — Catalyst resolves both to the
    plain aggregate the oracle spells out."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_li_sugar"
    )
    return spark.sql(
        """
        SELECT * EXCEPT (helper)
        FROM (
          SELECT l_returnflag, l_linestatus,
                 count(*) AS helper,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_qty,
                 CAST(avg(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                     AS avg_disc
          FROM v_li_sugar
          GROUP BY ALL
        )
        """
    )


SQL_MODERN_SUGAR_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       CAST(avg(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS avg_disc
FROM lineitem
GROUP BY 1, 2
"""


# --- approximate percentiles (rows-only) -------------------------------------


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summaries per group: p50/p95 of extended
    price with accuracy 10000 (~0.01 rank error).  Partial summaries
    combine map-side exactly like sum — no global sort, no whole-column
    shuffle; the exact twin ``agg_percentile_exact`` is the
    cross-checked baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    # Scalar DOUBLE columns, not the raw array: the external driver
    # canonicalizes rows-only outputs too, and an ArrayType cell crashes
    # its pandas sort (CORRECTNESS_r04 agg_approx_percentile, same class
    # as r03 embed_quantize_int8).  element_at unpacks the one summary
    # into two scalars — no extra pass over the data.
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
    )
    return li.groupBy("l_returnflag").agg(
        F.element_at(pct, 1).alias("approx_p50"),
        F.element_at(pct, 2).alias("approx_p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )


QUERIES: dict[str, QuerySpec] = {
    "safe_math": QuerySpec(safe_math, SAFE_MATH_SQL),
    "sql_modern_sugar": QuerySpec(sql_modern_sugar, SQL_MODERN_SUGAR_SQL),
    "agg_approx_percentile": QuerySpec(agg_approx_percentile, None),
}
