"""Distributed graph analytics: fixed-point-integer PageRank and
degree-ordered triangle counting.

The engine's graph surface (with ``operators/components.py``'s
large-star/small-star connected components) — here the ranking half:
PageRank over an edge table, run for a fixed number of synchronous
iterations.

Why INTEGER fixed-point: PageRank is a repeated float reduction
(sum of neighbour contributions), and float SUM order is
engine/partitioning-dependent — ulp drift compounds per iteration and a
DuckDB oracle could never hash-match. This implementation scales rank
mass to integer micro-units (``SCALE = 10**9``) and uses only BIGINT
``+``, ``*`` and integer division (``div`` in Spark SQL, ``//`` in
DuckDB — both truncating, and all quantities here are non-negative so
truncation == floor). BIGINT sums are associative/commutative → the
result is BIT-exact regardless of partitioning, AQE re-plans, or the
oracle engine. Overflow headroom: ``85 * sum(contrib)`` is bounded by
``85 * N * SCALE``; safe to N ≈ 10**8 nodes per connected sum at
SCALE=1e9 (and SCALE can drop to 1e6 for larger graphs).

Update rule per iteration (damping 0.85 expressed in integers)::

    contrib(u->v) = r[u] div outdeg[u]
    r'[v]         = (15 * SCALE) div 100  +  (85 * sum contrib) div 100

Scale shape (100 TB): each iteration is one shuffle — join ranks to the
edge list on ``src`` (ranks are |V|-sized, edges |E|-sized; the join key
is the natural graph partitioning, so a pre-bucketed edge table makes
this co-located), then a groupBy ``dst`` with map-side partial sums.
The plan below composes ``n_iter`` such rounds lazily; a production run
at billions of edges would ``localCheckpoint`` each round to cut lineage
(documented, same policy as operators/components.py) — at query scale
the shallow 4-round plan is cheaper to leave lazy.

Reference parity: the reference (a 228-line weather DAG,
airflow/dags/weather_etl.py) has no graph surface; this extends the
engine per the brief's training-pipeline mandate (graph dedup /
authority weighting over web corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**9


def pagerank_fixed_point(
    edges: DataFrame, n_iter: int = 4, broadcast_ranks: bool = False
) -> DataFrame:
    """PageRank over a directed edge table ``(src, dst)`` (int node ids
    join ~3× faster than strings — relabel at the edges, not here),
    ``n_iter`` synchronous iterations, damping 0.85, all arithmetic in
    BIGINT fixed point (see module docstring).

    Every node must appear as a ``src`` at least once (callers ranking an
    undirected graph emit both directions, which guarantees it); dangling
    nodes would need the classic mass-redistribution term, out of scope
    for the symmetric corpora this ranks.

    ``broadcast_ranks=True`` hints the per-iteration rank join as a
    broadcast: the rank table is |V|-sized, so when the node set is
    dimension-bounded (entity graphs: customers×suppliers, domains×hosts
    — up to ~10^7 nodes) every iteration becomes a broadcast map join
    over the edges plus ONE map-side-combined aggregate; the |E|-sized
    edge table never shuffles after the initial materialization. Leave
    False for web-scale |V| (ranks then co-shuffle with the edges on
    ``src`` — the classic partitioned formulation).

    Returns ``(node, rank_scaled)`` with ``rank_scaled`` = rank × SCALE
    as BIGINT.
    """
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) — materialized ONCE and reused every iteration:
    # without the checkpoint each iteration re-derives the edge build
    # (scan + join + distinct) through lineage, multiplying the most
    # expensive stage by n_iter (same per-round policy as
    # operators/components.py's star-contraction loop).
    adj = edges.join(deg, "src").localCheckpoint()
    deg = adj.select(F.col("src"), F.col("outdeg")).distinct()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("r"))
    for _ in range(n_iter):
        rhs = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            adj.join(rhs, adj["src"] == rhs["node"])
            .select(F.col("dst"), F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("agg"))
        )
        rhs2 = F.broadcast(contrib) if broadcast_ranks else contrib
        ranks = (
            deg.select(F.col("src").alias("node"))
            .join(rhs2, F.col("node") == rhs2["dst"], "left")
            .select(
                "node",
                # teleport term precomputed in Python ((15*SCALE) div 100):
                # a literal `15 * SCALE` would constant-fold as INT and
                # overflow under ANSI mode.
                F.expr(
                    f"CAST({(15 * SCALE) // 100} + (85 * coalesce(agg, 0)) div 100 AS BIGINT)"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def triangle_counts(
    edges: DataFrame,
    broadcast_adj: bool = False,
    max_broadcast_edges: int = 8_000_000,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    ``edges`` must be the canonical deduplicated edge table ``(a, b)``
    with ``a < b`` (one row per undirected edge, no self-loops) and
    BIGINT-safe integer node ids.

    Algorithm — degree-ordered orientation (the Suri–Vassilvitskii /
    Cohen MapReduce formulation, the standard distributed shape): every
    edge is oriented from its (degree, id)-smaller endpoint to the
    larger one, which bounds every node's out-degree by O(sqrt(|E|))
    regardless of skew — a degree-10^6 hub generates 10^12 wedges under
    a naive neighbor self-join but stays bounded under orientation,
    which is what makes this survive power-law graphs at 100 TB. Each
    triangle ``u->v, u->w, v->w`` is found exactly once, AT its wedge
    edge ``(u, v)``, as a member of ``array_intersect(adjout[u],
    adjout[v])`` — the edge-iterator formulation: the candidate wedge
    set (41M rows for a 1.2M-edge co-purchase graph; only ~2% close)
    is never materialized or shuffled, the intersection runs inside
    whole-stage codegen, and only ACTUAL triangles explode into rows.
    All shuffles are equi-joins on node keys: degree count, adjacency
    groupBy, two |E|-sized adjacency-attach joins — co-locatable by
    bucketing the oriented table on ``src``. Per-edge intersection work
    is bounded by the orientation's O(sqrt(|E|)) out-degree cap.

    The total order is materialized as one BIGINT ``key = degree * 2^32
    + id`` (exact while degrees and ids stay below 2^31 — checked by the
    caller's id encoding), so orientation is a single integer comparison
    instead of a struct comparison.

    ``broadcast_adj=True`` hints the two adjacency-attach joins as
    broadcasts: the adjacency table is |V|-sized (one row per node with
    out-edges, arrays bounded by the orientation's sqrt(|E|) cap), so on
    a dimension-bounded node set (entity graphs — parts, domains, hosts)
    both attaches become map joins and the |E|-sized oriented table,
    whose rows carry the ~sqrt(|E|)-element array payload after the
    attach, never shuffles again (measured 6.2 s -> 3.4 s warm on the
    1.2M-edge sf0.1 co-purchase graph). Leave False for web-scale |V|
    (the attaches then co-shuffle on ``src``/``dst``).

    The hint is GATED on the measured edge count (r9 — the 30x decade
    run caught the naked hint OOMing the broadcast build): the
    adjacency payload totals |E| longs regardless of |V|, so past
    ``max_broadcast_edges`` (default 8M ~ 64 MB of array entries) the
    hint is ignored and the attaches co-shuffle. The count is ~free:
    the oriented table was just localCheckpoint-materialized.

    Returns ``(node, n_triangles)`` — nodes that close at least one
    triangle, exact BIGINT counts (order-free, hash-exact vs a SQL
    oracle restating the same orientation).
    """
    # The edge table feeds the degree count AND both sides of the
    # orientation join; the oriented table feeds BOTH sides of the wedge
    # self-join AND the closing join. Self-joins recompute their input
    # through lineage unless materialized (same policy as the LSH bucket
    # tables in operators/similarity.py), so both are checkpointed —
    # without this the corpus-scale edge build runs five times.
    e = edges.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    ).localCheckpoint()
    nodes = e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    keyed = deg.select("n", F.expr("d * 4294967296 + n").alias("key"))
    ka, kb = keyed.alias("ka"), keyed.alias("kb")
    # merge hints (r9 — the 30x decade run caught it): past the explode
    # + distinct, the EDGE table's static size estimate collapses and
    # the planner broadcast e itself (a ~600 MB hashed relation at 36M
    # edges — broadcast-build OOM). Sort-merge is spillable either way
    # round; AQE's measured runtime stats keep small graphs cheap.
    oriented = (
        e.hint("merge").join(ka, F.col("a") == F.col("ka.n"))
        .join(kb, F.col("b") == F.col("kb.n"))
        .select(
            F.when(F.col("ka.key") < F.col("kb.key"), F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(F.col("ka.key") < F.col("kb.key"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    ).localCheckpoint()
    adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    adj_u = adj.select(F.col("src"), F.col("nbrs").alias("u_nbrs"))
    adj_v = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("v_nbrs"))
    if broadcast_adj and oriented.count() <= max_broadcast_edges:
        adj_u, adj_v = F.broadcast(adj_u), F.broadcast(adj_v)
    tri_e = (
        oriented.select("src", "dst")
        .join(adj_u, "src")
        .join(adj_v, "dst")
        .select(
            "src", "dst", F.array_intersect("u_nbrs", "v_nbrs").alias("closers")
        )
        .filter(F.size("closers") > 0)
    )
    # a triangle (u, v, w) found at edge (u, v) credits u and v once per
    # closer and each closer w once — integer sums, order-free
    counts = (
        tri_e.select(
            F.col("src").alias("node"), F.size("closers").cast("long").alias("c")
        )
        .unionAll(
            tri_e.select(
                F.col("dst").alias("node"), F.size("closers").cast("long").alias("c")
            )
        )
        .unionAll(
            tri_e.select(
                F.explode("closers").alias("node"), F.lit(1).cast("long").alias("c")
            )
        )
    )
    return counts.groupBy("node").agg(F.sum("c").cast("long").alias("n_triangles"))
