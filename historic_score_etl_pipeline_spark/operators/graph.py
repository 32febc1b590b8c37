"""Connected components over an edge DataFrame — the clustering step a
dedup pipeline needs after candidate-pair generation (SURVEY.md §2K-K2:
MinHash/LSH emits PAIRS; grouping pairs into duplicate CLUSTERS and
electing a canonical representative is a connected-components problem).

Algorithm: iterative minimum-label propagation.  Every node starts as its
own component (its own id); each round, every node adopts the smallest
component id among itself and its neighbors; converged when no label
changes.  Rounds = graph diameter (≤ log n with the star-contraction
variants; plain propagation is kept here for semantic transparency — the
driver loop is ~5 iterations on real dedup graphs, which are
near-cliques).

Scale notes:
* each round is one shuffle keyed on node id — the frontier DataFrame
  stays |V| rows regardless of |E| because labels are min-aggregated
  before the join;
* ``localCheckpoint`` truncates the lineage every round — without it the
  plan doubles per iteration and the job dies of planning time long
  before it dies of data;
* convergence is detected with a count of changed labels (one cheap
  action per round) — no driver-side collection of the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough; both
    directions are derived internally).  Node ids must be orderable
    (the min id in each component becomes its canonical label).
    """
    # Symmetrize once; self-loops drop out naturally (they never lower a label).
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    # Pin the edge list: every iteration joins against `sym`, and without
    # this the WHOLE upstream lineage (e.g. MinHash → LSH banding →
    # Jaccard verify in the dedup pipeline) re-executes once per round
    # per action.  localCheckpoint materializes it once and truncates the
    # lineage — the single biggest win in the iterative loop.
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        # Each node's candidate label: min over neighbors' current labels.
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = updated.where(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels
