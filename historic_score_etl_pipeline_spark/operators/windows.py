"""Window operators (SURVEY.md §2G/§2H).

The reference's one true window op is pandas ``ffill()`` over rowspan'd
dates (app/ref_utilities.py:103); its "last 10 recent games" ordering is
implicit page order (app/team_utilities.py:447).  Spark has no implicit row
order, so every operator here demands an explicit total order — the
fixture tables carry unique keys (event_id, l_linenumber) for exactly this
(SURVEY.md §7 hard-part b).

Scale notes: all of these shuffle once on the partition key.  A window
with no partitionBy is a single-task global sort — zip_index_join is the
only operator allowed to do that, and it documents why.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def ffill(
    col: Column | str,
    partition_by: list[str],
    order_by: list[str],
) -> Column:
    """Forward-fill: latest non-null value up to the current row.

    pandas ``df['date'].replace('', np.nan).ffill()``
    (app/ref_utilities.py:103) with the row order made explicit.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last(c, ignorenulls=True).over(w)


def topk_per_key(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per key — "last 10 recent games per team"
    (app/team_utilities.py:18-19,447).  ``order_by`` must be a total order
    (include a unique tiebreak) or results are nondeterministic."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def running_sum(
    col: Column | str,
    partition_by: list[str],
    order_by: list[str],
    scale: int = 2,
) -> Column:
    """Running total with DECIMAL accumulation (exact at any prefix, so
    identical on any partitioning) surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.sum(c.cast(f"decimal(18,{scale})")).over(w).cast("double")


def rolling_zscore_flags(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_cents: Column | str,
    lookback: int = 8,
    min_n: int = 4,
    k: int = 2,
) -> DataFrame:
    """Rolling z-score outlier flags with EXACT integer arithmetic — no
    float mean/std anywhere, so the flags are identical on 1 or 1000
    executors and across engines.

    The value arrives as integer cents (``value_cents``, BIGINT).  Over
    the previous ``lookback`` rows per key (current row EXCLUDED), with
    n = count, S = Σx, SS = Σx²:

        |x − μ| > k·σ   ⟺   (n·x − S)² > k²·(n·SS − S²)

    — the float inequality multiplied through by n², leaving only BIGINT
    products (bounded: |n·x−S| ≤ n·max_cents, safe for cents ≤ ~10⁹/n).
    Rows with fewer than ``min_n`` prior values are never flagged.

    Scale shape: one hash shuffle on the key, one window pass computing
    count/sum/sumsq over the same frame (one Window exec); state per
    partition is three running longs.
    """
    x = F.col(value_cents) if isinstance(value_cents, str) else value_cents
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    n = F.count(x).over(w)
    s = F.sum(x).over(w)
    ss = F.sum(x * x).over(w)
    lhs = (n * x - s) * (n * x - s)
    rhs = F.lit(int(k * k)) * (n * ss - s * s)
    # one select, window expressions inline → ONE physical Window exec
    # (a withColumn chain that re-reads n_window would plan a second one)
    return df.select(
        "*",
        n.cast("long").alias("n_window"),
        F.when(n < min_n, F.lit(False)).otherwise(lhs > rhs).alias(
            "is_anomaly"
        ),
    )
