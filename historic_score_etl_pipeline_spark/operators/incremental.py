"""Incremental materialized-view maintenance (SURVEY.md §2I-I1/I3
extension).

The reference recomputes its whole 2-day horizon every run
(``app/main.py:19``, ``app/team_utilities.py:436``).  The scale-correct
form keeps an *aggregate state table* and folds in only the new
partition's partial aggregates:

    new_state = combine(old_state, partial_agg(delta))

which is sound for any commutative-monoid measure (count, sum, min, max
— and avg/stddev via their sum/count/sumsq decompositions).  At 100 TB
the delta is one date partition; the state table is |groups| rows; the
fact table is never rescanned.  This is exactly the fold Structured
Streaming's stateful aggregation performs per micro-batch — expressed
here as a batch operator so it composes with plain jobs and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure name → (delta partial expr builder, state combine expr builder)
_COMBINE = {
    "sum": (lambda c: F.sum(c), lambda n: F.sum(n)),
    "count": (lambda c: F.count(c), lambda n: F.sum(n)),
    "min": (lambda c: F.min(c), lambda n: F.min(n)),
    "max": (lambda c: F.max(c), lambda n: F.max(n)),
}


def partial_aggregate(
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate a delta batch into state-shaped partials.

    ``measures`` maps output column → (kind, input column), kind in
    {sum, count, min, max}.
    """
    aggs = []
    for out, (kind, col) in measures.items():
        partial, _ = _COMBINE[kind]
        aggs.append(partial(F.col(col)).alias(out))
    return delta.groupBy(*keys).agg(*aggs)


def merge_state(
    state: DataFrame,
    delta_partial: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold delta partials into the existing state: union the two
    state-shaped frames and re-combine per key.  New keys appear,
    existing keys update, untouched keys pass through — one small
    shuffle over |groups| rows, never over the fact table."""
    aggs = []
    for out, (kind, _) in measures.items():
        _, combine = _COMBINE[kind]
        aggs.append(combine(F.col(out)).alias(out))
    return state.unionByName(delta_partial).groupBy(*keys).agg(*aggs)
