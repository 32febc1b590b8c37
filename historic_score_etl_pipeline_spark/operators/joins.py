"""Join operators (SURVEY.md §2E).

The reference performs every join imperatively (per-row loops + sentinel
defaults, app/team_utilities.py:448-506; app/ref_utilities.py:113-202).
Here each becomes one declarative join Catalyst can plan:

* small dimension side → ``broadcast()`` (BroadcastHashJoin, no shuffle of
  the fact table);
* fact ⋈ fact equi-joins → SortMergeJoin with AQE skew splitting;
* as-of/last-N → one shuffle by (key), window rank, filter — at 100 TB the
  history side should be ``bucketBy(key)`` so the shuffle disappears
  (see sinks.bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zip_index_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str],
    right_order: list[str],
    how: str = "inner",
) -> DataFrame:
    """Positional (zip) join — aligns two frames by row position
    (app/team_utilities.py:418-420 ``zip(clean, id_match)``).

    Spark rows are unordered, so position must be materialized: row_number
    over an explicit total order.  NOTE: a global row_number is a
    single-partition sort — correct but serial.  At scale, zip joins
    should be re-keyed on a real join key upstream; this operator exists
    for parity with the reference's positional semantics.
    """
    wl = Window.orderBy(*[F.col(c) for c in left_order])
    wr = Window.orderBy(*[F.col(c) for c in right_order])
    lhs = left.withColumn("zip_idx", F.row_number().over(wl))
    rhs = right.withColumn("zip_idx", F.row_number().over(wr))
    return lhs.join(rhs, "zip_idx", how)


def left_enrich(
    fixtures: DataFrame,
    details: DataFrame,
    on,
    defaults: dict[str, str],
) -> DataFrame:
    """LEFT OUTER enrichment with sentinel defaults — the reference's
    fetch-or-``'{}'`` loops (app/team_utilities.py:448-506) as one
    broadcast join.  ``defaults`` maps enrichment column → sentinel used
    when the detail side has no match (E4)."""
    out = fixtures.join(F.broadcast(details), on, "left")
    for col, sentinel in defaults.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(sentinel)))
    return out


def asof_last_n(
    left: DataFrame,
    right: DataFrame,
    partition_key: str,
    left_ts: str,
    right_ts: str,
    n: int = 1,
    tiebreak: str | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest ``n`` right rows with
    ``right_ts <= left_ts`` within the same ``partition_key``.

    The reference's latent "last 10 games before the fixture"
    (app/team_utilities.py:447).  Implemented as conditional join +
    window rank with a total-order tiebreak.  At 100 TB both sides
    should be bucketed by ``partition_key``.
    """
    lhs = left.alias("l")
    rhs = right.alias("r")
    cond = (F.col(f"l.{partition_key}") == F.col(f"r.{partition_key}")) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
    )
    joined = lhs.join(rhs, cond, "left")
    order = [F.col(f"r.{right_ts}").desc()]
    if tiebreak:
        order.append(F.col(f"r.{tiebreak}").desc())
    w = Window.partitionBy(*[F.col(c) for c in _left_key_cols(left)]).orderBy(*order)
    ranked = joined.withColumn("asof_rn", F.row_number().over(w))
    return ranked.where((F.col("asof_rn") <= n) | F.col(f"r.{right_ts}").isNull())


def _left_key_cols(left: DataFrame) -> list[str]:
    # Internal: partition the rank window by the left row identity; caller
    # guarantees the first column is a unique key.
    return [f"l.{left.columns[0]}"]


def theta_contains_join(
    facts: DataFrame, tokens: DataFrame, text_col: str, token_col: str
) -> DataFrame:
    """Non-equi containment join (app/team_utilities.py:253-258
    ``team in home_teamname``).  The token side must be tiny — Spark
    executes this as BroadcastNestedLoopJoin, which is O(|facts|·|tokens|)
    work but only |tokens| broadcast bytes."""
    return facts.join(
        F.broadcast(tokens), F.instr(F.col(text_col), F.col(token_col)) > 0, "inner"
    )
