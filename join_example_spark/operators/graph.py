"""Connected components via iterative min-label propagation.

The endgame of near-dup detection: candidate pairs are EDGES, and the unit
of deduplication is the connected COMPONENT (a transitively-linked cluster
of near-duplicates), from which one representative is kept.

Algorithm (the standard Pregel-style formulation, expressed in DataFrame
ops): every node starts labeled with its own id; each round, a node takes
the min of its label and its neighbors' labels; at fixpoint, every node of
a component carries the component's minimum id. Deterministic — min is
order-independent — so the result is oracle-checkable against a recursive
SQL reachability query.

Scale notes:
- each round is one shuffle (edge⋈label join + min-aggregate) — O(diameter)
  rounds total, and near-dup components have tiny diameters in practice;
- the driver loop carries only a single scalar per round (the count of
  rows whose label changed this round; zero means fixpoint — a count is
  used rather than a label sum so string ids work and no precision is
  lost) — no row data ever reaches the driver;
- ``localCheckpoint`` truncates the growing lineage each round (on a real
  cluster, use a reliable ``checkpoint`` dir instead so executor loss
  doesn't replay the whole chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes`` must contain each vertex exactly once; ``edges`` is undirected
    input (symmetrized internally). Raises if not converged in ``max_iter``
    rounds — converge-or-die beats silently-partial clusters.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.localCheckpoint(eager=True)

    all_nodes = nodes.select(F.col(id_col).alias("id"))
    # Only edge-touched nodes participate in propagation — singletons (the
    # bulk of a dedup corpus) are their own component by definition, so the
    # iterative working set shrinks from |V| to |V_active|.
    active = sym.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    labels = active.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    if labels.isEmpty():  # no edges at all — everything is a singleton
        return all_nodes.select("id", F.col("id").alias("cluster_id"))

    # Convergence witness: exact per-round changed-row count (works for any
    # id type — a numeric label-sum would crash on string ids under ANSI
    # and could lose precision beyond 2^53). Note the fixpoint needs one
    # confirming no-change round, so a component of diameter D converges
    # within D+1 rounds; size max_iter accordingly.
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "prev_label")
            .join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("prev_label"), F.coalesce("nbr_label", F.col("prev_label"))
                ).alias("label"),
                "prev_label",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("label") != F.col("prev_label")).count()
        labels = new_labels.drop("prev_label")
        if changed == 0:
            singletons = all_nodes.join(active, "id", "left_anti").select(
                "id", F.col("id").alias("cluster_id")
            )
            return labels.select("id", F.col("label").alias("cluster_id")).union(
                singletons
            )
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
