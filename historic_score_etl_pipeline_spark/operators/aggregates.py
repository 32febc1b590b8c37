"""Aggregation operators (SURVEY.md §2D).

The reference's signature aggregation is dict-bucketing activity minutes per
match side (app/team_utilities.py:277-304) — re-expressed here as
shuffle-once groupBy with map-side partial aggregation, plus the
determinism machinery the oracle gate needs:

* ``sorted_collect_csv`` — collect_list is order-nondeterministic across
  partitions; array_sort fixes the order, csv-join makes the value
  hashable identically in any engine.
* ``decimal_sum_double`` — double summation is order-dependent at scale;
  summing DECIMAL is exact and associative, so the result is identical on
  1 or 1000 executors.  Cast back to double only at the end.

At 100 TB: groupBy shuffles once on the group key; all these aggregates
have partial (map-side) implementations, so the shuffle carries partial
states, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_collect_csv(col: Column | str, sep: str = ",") -> Column:
    """Deterministic collect_list: sort, then serialize to a csv string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_list(c)), sep)


def sorted_collect_json(*cols: Column | str) -> Column:
    """Deterministic collect of structs, serialized to a JSON array string
    (the engine's replacement for the reference's dict-of-parallel-arrays
    JSONB shape, app/ref_utilities.py:173)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.to_json(F.array_sort(F.collect_list(F.struct(*parts))))


def decimal_sum_double(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent sum of a measure: DECIMAL-accumulate,
    surface as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def pivot_collect_csv(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    suffix: str = "_ids",
) -> DataFrame:
    """Wide pivot of sorted collect_lists — the reference's fixed-key
    activity dict (app/team_utilities.py:284-286) as a real pivot.

    Explicit ``pivot_values`` avoids the extra distinct-values job and
    keeps the plan static — mandatory at scale.
    """
    out = (
        df.groupBy(group_col)
        .pivot(pivot_col, pivot_values)
        .agg(sorted_collect_csv(value_col))
    )
    for v in pivot_values:
        out = out.withColumnRenamed(v, f"{v}{suffix}")
    return out


def grouped_ewma(
    df: DataFrame,
    key: str,
    value: str,
    order: list[str],
    alpha: float = 0.5,
) -> DataFrame:
    """Grouped-map UDAF (SURVEY.md §2J-J3): per-key exponentially weighted
    mean of ``value`` in ``order`` — recursive state that collect_list /
    window frames cannot express.

    ``applyInPandas``: Arrow ships each key group to pandas once,
    ``ewm(...).mean()`` is vectorized C inside the group, and the only
    shuffle is the groupBy on ``key``.  Each group must fit in one
    worker's memory — true for per-customer/per-team histories; for
    monster groups, chunk by time first.
    """
    import pandas as pd

    out_schema = f"{key} long, ewma double"

    def ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order)
        final = pdf[value].ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        return pd.DataFrame({key: [pdf[key].iloc[0]], "ewma": [float(final)]})

    return (
        df.select(key, value, *order)
        .groupBy(key)
        .applyInPandas(ewma, out_schema)
    )
