"""Mergeable sketches — the pre-aggregation pattern that makes distinct
counting tractable at 100 TB (SURVEY.md §2D-D6 extension).

``approx_count_distinct`` answers one query; a *stored HLL sketch* per
(partition, group) answers every future rollup of those groups without
rescanning the data: union the sketches, read the estimate.  That is the
Datasketches property Spark 3.5+ exposes as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``.

The scale story: sketch build is one pass over the fact table with map-side
partial aggregation (sketches combine associatively inside the hash
aggregate); each stored sketch is ~KB regardless of input rows; any
time-range / dimension rollup then touches only sketch rows.  Re-aggregating
raw data per query is the thing this kills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per group — the stored,
    incrementally-maintainable form of count-distinct state."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_estimate(
    sketches: DataFrame,
    rollup_cols: list[str],
) -> DataFrame:
    """Merge stored sketches up to a coarser grouping and read the
    distinct estimate — no raw-data rescan.  Sketch union is lossless
    (same lg_k), so the rolled-up estimate is IDENTICAL to the estimate
    a direct sketch over the raw data would give."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if rollup_cols:
        return sketches.groupBy(*rollup_cols).agg(*agg)
    return sketches.agg(*agg)
