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


def heavy_hitters_exact(
    items: DataFrame,
    item_col: str,
    k: int = 64,
    min_share_denom: int = 50,
) -> DataFrame:
    """EXACT frequent items above a frequency threshold, at sketch cost —
    the two-phase candidates-then-verify pattern with a PROVABLE
    guarantee (Misra–Gries 1982; merged-summary bound per Agarwal et al.
    2013, "Mergeable Summaries"):

    * Phase 1 (one pass, mapInPandas per partition): each partition
      keeps a Misra–Gries summary of ``k`` counters and emits ≤ k
      candidate rows.  Any item with GLOBAL count > N/(k+1) is
      guaranteed to survive in at least one partition summary — the
      candidate union is a certified superset of every item above that
      bound.
    * Phase 2 (one small join): exact counts of the candidates only
      (semi-join prunes the recount to candidate rows), filtered to
      count > N/min_share_denom.

    Validity requires ``min_share_denom < k + 1`` (threshold above the
    MG bound) — enforced.  Output is EXACT and deterministic regardless
    of partitioning (the candidate superset may vary; the verified,
    thresholded output cannot) — which is what makes an oracle possible
    for a sketch-based operator.

    Scale shape: phase 1 is embarrassingly parallel, O(k) state per
    partition, ≤ k·P candidate rows total; phase 2 re-scans the items
    once with a broadcast semi-join and aggregates only matching rows.
    The full groupBy-count this replaces shuffles EVERY distinct item;
    here the shuffle carries candidates only.
    """
    from collections.abc import Iterator

    import pandas as pd

    if min_share_denom >= k + 1:
        raise ValueError(
            f"threshold N/{min_share_denom} must exceed the MG bound "
            f"N/{k + 1}: need min_share_denom < k+1"
        )

    def mg_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in pdfs:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:  # decrement-all step (dict rebuild, O(k))
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({"candidate": list(counters.keys())})

    candidates = (
        items.select(item_col)
        .mapInPandas(mg_partition, "candidate string")
        .distinct()
    )
    n_total = items.count()  # one scalar action (like CC / PageRank)
    threshold = n_total // min_share_denom
    return (
        items.join(
            F.broadcast(candidates),
            items[item_col] == candidates["candidate"],
            "inner",
        )
        .groupBy("candidate")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") > threshold)
        .select(F.col("candidate").alias(item_col), "n")
    )
