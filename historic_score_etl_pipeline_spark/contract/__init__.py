"""The driver contract registry.

Each sub-module defines ``QUERIES: dict[name, QuerySpec]`` where a QuerySpec
couples one Spark query callable ``(spark, sf_dir) -> DataFrame`` with its
DuckDB oracle SQL twin (``None`` for non-SQL-expressible, rows-only ops).
``__spark_entry__.py`` re-exports the merged registry.

Determinism rules every spec follows (SURVEY.md §2L cautions):
* alias every computed column identically in Spark and SQL;
* sort inside every collect_list / string_agg;
* money/measure sums go through DECIMAL so they are exact, ratios are
  derived from exact sums then rounded — never raw double accumulation;
* every window / top-N has a total-order tiebreak;
* no dependence on session conf (explicit try_cast, explicit UTC-free
  NTZ timestamps).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One contract entry: Spark implementation + DuckDB oracle twin."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


def _merged() -> dict[str, QuerySpec]:
    from historic_score_etl_pipeline_spark.contract import (
        aggregates,
        extensions,
        joins,
        scans,
        surface,
        surface2,
        surface3,
        surface4,
        surface5,
        surface6,
        surface7,
        surface8,
        surface9,
        surface10,
        surface11,
        surface12,
        surface13,
        windows,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        scans,
        aggregates,
        joins,
        windows,
        extensions,
        surface,
        surface2,
        surface3,
        surface4,
        surface5,
        surface6,
        surface7,
        surface8,
        surface9,
        surface10,
        surface11,
        surface12,
        surface13,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(mod.QUERIES)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in _merged().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _merged().items()
        if spec.oracle is not None
    }
