"""Connected components over near-dup pair edges (SURVEY.md §2.11 L2 —
the dedup end-game: pairs -> clusters -> one canonical doc per cluster).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min label among itself and
its neighbors; fixpoint when no label changes. The fixpoint label is the
component-minimum id — deterministic, so the result is oracle-checkable
(DuckDB mirrors it with a recursive CTE).

This is the one deliberately *iterative* operator in the engine (the
driver's "iterative algorithms" category): the loop lives on the driver,
each round is one shuffle join + aggregation, and rounds are bounded by
the component diameter (near-dup clusters are shallow — a handful of
rounds in practice). At huge scale the same loop runs over checkpointed
intermediate tables (or GraphFrames' optimized large-star/small-star,
same contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected edges -> (doc_id, cluster_id) where
    cluster_id is the minimum member id of the component. Only nodes that
    appear in at least one edge are returned (singletons are their own
    trivial cluster by definition — callers union them if needed)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    # Iterative plans MUST truncate lineage each round: persist() caches
    # data but the logical plan still accretes one join+agg per iteration,
    # and re-analysis of the growing tree blows driver memory long before
    # the data does. localCheckpoint materializes AND cuts the lineage
    # (at production scale: checkpoint() to reliable storage instead).
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )

    changed = -1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Exiting with unconverged labels would silently split clusters
        # (labels propagate one hop per round — a chain longer than
        # max_iterations never reaches its component minimum).
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — component "
            "diameter exceeds the round budget; raise max_iterations or "
            "switch to the large-star/small-star variant"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def canonical_members(components: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): the canonical survivor of each
    cluster is its minimum id (== the cluster label)."""
    return components.withColumn(
        "is_canonical", F.col("doc_id") == F.col("cluster_id")
    )
