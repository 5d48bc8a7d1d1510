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

from pyspark.storagelevel import StorageLevel

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
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
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

    converged = False
    changed = 0
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
            converged = True
            break
    edges.unpersist()
    if not converged:
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


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly-larger neighbors
    to the minimum of its closed neighborhood. Input/output edges are in
    canonical (src > dst) orientation; both orientations are expanded
    internally so each node sees its full neighborhood."""
    nbrs = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("mv"))
        .select("src", F.least(F.col("mv"), F.col("src")).alias("m"))
    )
    # emit (v, m) for neighbors v > u; v > u >= m, so output is canonical
    # and never a self-loop
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: every node connects its smaller-or-equal
    neighborhood (plus itself) to that neighborhood's minimum. With edges
    canonically oriented (src > dst), each group key's dst set IS the
    smaller neighborhood, so no orientation expansion is needed."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("m"))  # m < src
    members = (
        edges.join(mins, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    selfs = mins.select(F.col("src"), F.col("m").alias("dst"))
    return members.union(selfs).distinct()


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., *Connected Components in MapReduce and Beyond*,
    SoCC'14 — public literature). Same contract and output as
    ``connected_components``: (doc_id, cluster_id = component minimum) for
    every node appearing in at least one edge.

    Why it exists: min-label propagation needs O(diameter) rounds — a
    10k-long dup chain (pathological but real in crawl data) needs 10k
    shuffles. Star contraction converges in O(log^2 n) rounds regardless
    of diameter, because each round rewires nodes DIRECTLY to their
    current neighborhood minimum, halving (at least) the height of every
    component's tree. At fixpoint every component is a single star whose
    center is the component minimum. This is the 100 TB-scale default;
    label propagation stays as the simpler oracle-twin for shallow
    graphs."""
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("src"),
            F.least(F.col(id_a), F.col(id_b)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # DISK_ONLY (r10 — the g2 sf10 lesson generalized): the default
        # MEMORY_AND_DISK caches the |E|-sized table DESERIALIZED, and an
        # iterative operator pins one such block set PER ROUND while the
        # round's own sort-merge tasks compete for the same heap. Edge
        # rows are two longs — disk-backed blocks cost ~nothing to
        # re-read and remove the heap cliff at billion-edge scale.
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    converged = False
    for _ in range(max_iterations):
        # localCheckpoint per round: iterative plans must cut lineage or
        # driver-side re-analysis of the accreting tree OOMs (NOTES.md)
        # lazy checkpoint: lineage truncates per round (the requirement)
        # but materialization rides the round's own count() instead of a
        # dedicated job — one job per round, not two
        new_edges = _small_star(_large_star(edges)).localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY
        )
        same_count = new_edges.count() == edges.count()
        if same_count and new_edges.exceptAll(edges).isEmpty():
            converged = True
            edges = new_edges
            break
        edges = new_edges
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not reach a star fixpoint in "
            f"{max_iterations} iterations — raise max_iterations (O(log^2 n) "
            "rounds suffice for any graph, so this indicates pathology)"
        )
    return (
        edges.select(F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id"))
        .union(
            edges.select(F.col("dst").alias("doc_id"), F.col("dst").alias("cluster_id"))
        )
        .distinct()
    )


def canonical_members(components: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): the canonical survivor of each
    cluster is its minimum id (== the cluster label)."""
    return components.withColumn(
        "is_canonical", F.col("doc_id") == F.col("cluster_id")
    )
