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

import numpy as np

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
    # |V|-sized, consumed by every iteration's node frame AND the rank
    # seed — materialize the distinct once instead of re-running an
    # |E|-sized exchange per iteration (lazy: the seed job below
    # materializes it)
    deg = (
        adj.select(F.col("src"), F.col("outdeg"))
        .distinct()
        .localCheckpoint(eager=False)
    )
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


#: wedges expanded per numpy slice inside the wedge-stream kernel: caps
#: the per-slice (n_wedges x n_hashes) uint64 probe matrix at ~80 MB
#: regardless of hub degree (r10 advice — a sqrt(E)-degree hub would
#: otherwise materialize ~10^8 wedges in one allocation)
_WEDGE_SLICE = 2_000_000


def triangle_counts(
    edges: DataFrame,
    broadcast_adj: bool = False,
    max_broadcast_edges: int = 8_000_000,
    max_attach_edges: int = 16_000_000,
    kernel_task_factor: int = 0,
    wedge_slice: int | None = None,
    max_broadcast_vertices: int = 4_000_000,
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
    # DISK_ONLY (r10 — the sf10/120M-edge run OOMed the 32g local JVM):
    # localCheckpoint's default MEMORY_AND_DISK caches both |E|-sized
    # tables DESERIALIZED (~50 B/row of object overhead ≈ 6 GB each at
    # 120M edges) while 32 concurrent sort-merge tasks want the same
    # heap. Edge rows are two longs — (de)serialization is cheap and
    # each checkpoint is read back at most twice, so disk-backed blocks
    # cost ~nothing at small scale (sf0.1 unchanged, 4.5 s warm) and
    # remove the heap cliff entirely at the decade scales.
    from pyspark.storagelevel import StorageLevel

    e = edges.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    ).localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    n_edges = e.count()  # ~free: reads the checkpoint block index
    nodes = e.select(F.col("a").alias("n")).unionAll(e.select(F.col("b").alias("n")))
    # |V|-sized, consumed by BOTH orientation sides: checkpointed lazily
    # so the exact-|V| count below materializes it once and the two
    # broadcast builds (or merge-join sides) read blocks instead of each
    # re-running the 2|E|-row degree aggregation (r16)
    deg = (
        nodes.groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    n_vertices = deg.count()
    keyed = deg.select("n", F.expr("d * 4294967296 + n").alias("key"))
    ka, kb = keyed.alias("ka"), keyed.alias("kb")
    # Orientation join strategy, gated on the MEASURED vertex count
    # (r16, ADVICE — the old gate reused the 8M EDGE threshold, but the
    # keyed table is |V|-sized and |V| can reach 2|E| = 16M rows there:
    # with HashedRelation per-row overhead that broadcast build is
    # several hundred MB, far past the 64 MB rationale the constant was
    # sized for; the deg checkpoint makes the vertex count exact and
    # ~free). Below max_broadcast_vertices (4M keyed rows ≈ 64 MB of
    # payload) both attaches become map joins — the |E|-sized edge
    # table never shuffles or sorts here (guide §3.1). Past the
    # threshold: merge hints (r9 — the 30x decade run caught it): past
    # the explode + distinct, the EDGE table's static size estimate
    # collapses and the planner broadcast e itself (a ~600 MB hashed
    # relation at 36M edges — broadcast-build OOM). Sort-merge is
    # spillable either way round; AQE's measured runtime stats keep
    # small graphs cheap.
    if n_vertices <= max_broadcast_vertices:
        lhs, ka, kb = e, F.broadcast(ka), F.broadcast(kb)
    else:
        lhs = e.hint("merge")
    oriented = (
        lhs.join(ka, F.col("a") == F.col("ka.n"))
        .join(kb, F.col("b") == F.col("kb.n"))
        .select(
            F.when(F.col("ka.key") < F.col("kb.key"), F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(F.col("ka.key") < F.col("kb.key"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    ).localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    if n_edges > max_attach_edges:
        return _triangle_counts_wedge_stream(
            e, oriented, n_edges, kernel_task_factor, wedge_slice
        )
    # materialized ONCE (r16): adj feeds BOTH attach sides, and the two
    # broadcast builds (or co-shuffled join sides) are planned as
    # separate exchanges over non-identical projections — without the
    # checkpoint each re-runs the |E|-row adjacency aggregation from the
    # oriented table (same self-join policy as `e`/`oriented` above)
    adj = (
        oriented.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    adj_u = adj.select(F.col("src"), F.col("nbrs").alias("u_nbrs"))
    adj_v = adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("v_nbrs"))
    if broadcast_adj and n_edges <= max_broadcast_edges:
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
    # closer and each closer w once — integer sums, order-free. ONE pass
    # over tri_e (r15): the old three-way unionAll re-executed the
    # adjacency-attach + array_intersect subtree once per branch — the
    # dominant compute, paid 3x; a single explode of the per-edge
    # contribution array emits the identical (node, c) multiset.
    contrib = tri_e.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("src").alias("node"),
                        F.size("closers").cast("long").alias("c"),
                    ),
                    F.struct(
                        F.col("dst").alias("node"),
                        F.size("closers").cast("long").alias("c"),
                    ),
                ),
                F.transform(
                    "closers",
                    lambda w: F.struct(
                        w.alias("node"), F.lit(1).cast("long").alias("c")
                    ),
                ),
            )
        ).alias("p")
    ).select("p.node", "p.c")
    return contrib.groupBy("node").agg(F.sum("c").cast("long").alias("n_triangles"))


def _triangle_counts_wedge_stream(
    e: DataFrame,
    oriented: DataFrame,
    n_edges: int,
    kernel_task_factor: int = 0,
    wedge_slice: int | None = None,
) -> DataFrame:
    """The big-graph regime of :func:`triangle_counts` — identical
    output, communication turned from shuffle bytes into a map-side
    stream (r10; the sf10/120M-edge decade run is why it exists).

    The attach formulation above ships every edge's TWO adjacency
    arrays through two joins: Sum_over_edges(d_out(u) + d_out(v)) array
    entries — ~Sum(d^2), measured ~60 GB of shuffle+sort spill at 120M
    edges, which first OOMed the deserialized checkpoint cache and then
    (DISK_ONLY) filled the host's scratch disk. The same Theta(E^1.5)
    wedge work is unavoidable (triangle counting's communication lower
    bound), but it does NOT have to be materialized:

    1. adjacency once per NODE (one narrow groupBy of the oriented
       edges — the only corpus-wide shuffle this path performs),
    2. wedges (v, w) generated AND probed inside ONE ``mapInPandas``
       stage over the adjacency table: per node, ``np.triu_indices``
       expands the sorted neighbor array to its pairs and every pair is
       tested against a BLOOM FILTER of the canonical edge set (the j13
       machinery: distributed bitmap build via map-side ``bit_or``,
       ~8 bits/edge, fp ~1-2%, bitmap shipped as a Spark BROADCAST so
       workers fetch it once). Fusing generation+probe in the same
       numpy kernel matters enormously: a first cut that exploded
       wedges in codegen and filtered with a scalar pandas_udf paid the
       JVM->Arrow->Python transfer PER WEDGE (~Theta(E^1.5) keys — 892 s
       at sf3 vs 103 s for the attach path); fused, Python receives the
       adjacency itself (O(|E|) longs) and only survivors come back,
    3. only survivors — actual triangles plus the tiny fp stream — pay
       a narrow exact semi-join against the edge table, which removes
       every false positive: the declared result stays EXACT, the
       filter is pure plan shape (the j13 exactness argument verbatim).

    Probe keys pack (v, w) into one uint64 (v * 2^32 + w) — valid under
    the operator's existing id < 2^32 contract (the orientation key
    already requires it) and bit-identical to the build side's BIGINT
    expression. On a real cluster the same shape holds: step 2 is
    embarrassingly parallel map work; only steps 1 and 3 shuffle, both
    O(|E|) narrow rows."""
    import pandas as pd

    from .bloomjoin import _hash_constants, _positions, build_bloom_bitmap

    log2_m = min(30, max(20, int(np.ceil(np.log2(max(n_edges, 1) * 8)))))
    n_hashes = 5
    # BITWISE packing, not `a * 2^32 + b`: arithmetic packing raises
    # ANSI long-overflow for a >= 2^31, silently shrinking the
    # documented id < 2^32 envelope to 2^31 (caught by a wide-id
    # pytest). shiftleft|or wraps to the same two's-complement bit
    # pattern the kernel's uint64 packing produces, and the Bloom build
    # hashes through numpy uint64 on both sides — bit-identical keys at
    # every id in the contract.
    ekeys = e.select(
        F.expr("shiftleft(a, 32) | b").alias("ek")
    )
    bitmap = build_bloom_bitmap(ekeys, "ek", log2_m=log2_m, n_hashes=n_hashes)
    # broadcast, NOT closure: a 128 MiB closure ships with every task and
    # crashes the workers; the broadcast is fetched once per worker
    bitmap_bc = e.sparkSession.sparkContext.broadcast(bitmap)
    consts = _hash_constants(n_hashes)
    shift = np.uint64(64 - log2_m)
    # captured as a closure cell (not a module-global lookup) so the
    # value rides the pickled kernel to the workers deterministically
    slice_cap = int(wedge_slice or _WEDGE_SLICE)

    def _wedge_survivors(batches):
        bm = bitmap_bc.value
        for pdf in batches:
            out_u, out_v, out_w = [], [], []
            for u, nbrs in zip(pdf["src"].to_numpy(), pdf["nbrs"]):
                # native dtype (int32 when the adjacency build downcast,
                # int64 otherwise): the probe packing upcasts per-slice,
                # so neighbor + index arrays stay half-width on the
                # int32 path
                a = np.asarray(nbrs)
                k = len(a)
                if k < 2:
                    continue
                # Per-node wedge expansion is CHUNKED (r10 advice): a
                # hub at the orientation's O(sqrt(E)) degree bound
                # (~15k at 120M edges) has ~10^8 wedges — one
                # triu_indices + (n_wedges x n_hashes) probe matrix
                # would be multi-GB inside a single Python worker. Rows
                # are sliced so each slice holds <= _WEDGE_SLICE wedges
                # (peak ~n_hashes*8B*slice ~ 80 MB), bounding memory
                # regardless of hub degree. Row i contributes k-1-i
                # wedges (j > i), so slice bounds come from one cumsum
                # + searchsorted — no per-row Python loop.
                row_counts = k - 1 - np.arange(k - 1, dtype=np.int64)
                cum = np.cumsum(row_counts)
                if cum[-1] > slice_cap:
                    targets = np.arange(slice_cap, cum[-1], slice_cap)
                    cuts = np.searchsorted(cum, targets, side="left") + 1
                    bounds = np.unique(np.concatenate(([0], cuts, [k - 1])))
                else:
                    bounds = np.array([0, k - 1])
                for r0, r1 in zip(bounds[:-1], bounds[1:]):
                    counts = row_counts[r0:r1]
                    total = int(counts.sum())
                    if total == 0:
                        continue
                    # index arrays are int32 regardless of id width:
                    # every value is bounded by the slice cap (<= 2M) or
                    # the degree, both far under 2^31 — 3 arrays x 4B
                    # instead of 8B per wedge per slice
                    ii = np.repeat(
                        np.arange(r0, r1, dtype=np.int32),
                        counts,
                    )
                    seg_starts = np.concatenate(
                        ([0], np.cumsum(counts[:-1], dtype=np.int64))
                    ).astype(np.int32)
                    offs = np.arange(total, dtype=np.int32) - np.repeat(
                        seg_starts, counts
                    )
                    jj = ii + np.int32(1) + offs
                    v, w = a[ii], a[jj]
                    keys = (v.astype(np.uint64) << np.uint64(32)) | w.astype(
                        np.uint64
                    )
                    pos = (
                        (keys + np.uint64(1))[:, None] * consts[None, :]
                    ) >> shift
                    words = bm[pos >> np.uint64(6)]
                    hit = (
                        (words >> (pos & np.uint64(63))) & np.uint64(1)
                    ).all(axis=1)
                    n_hit = int(hit.sum())
                    if n_hit:
                        out_u.append(np.full(n_hit, u, dtype=np.int64))
                        # survivors upcast to the declared long schema
                        # (a tiny stream — triangles + Bloom fps)
                        out_v.append(v[hit].astype(np.int64))
                        out_w.append(w[hit].astype(np.int64))
            if out_u:
                yield pd.DataFrame(
                    {
                        "u": np.concatenate(out_u),
                        "v": np.concatenate(out_v),
                        "w": np.concatenate(out_w),
                    }
                )

    # int32 adjacency when every id fits (r10 verdict follow-up): the
    # groupBy below is the regime's one big shuffle — int dst halves its
    # bytes and the kernel's neighbor/index arrays. One map-side-combined
    # agg over the checkpointed table decides it; ids in [2^31, 2^32)
    # keep the long path (the uint64 probe packing is unchanged either
    # way, so the kernel is dtype-transparent).
    mx = oriented.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("m")
    ).first()["m"]
    src_df = oriented
    if mx is not None and mx < 2**31:
        src_df = oriented.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    adj = src_df.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    # kernel_task_factor is the skew dial for the kernel stage:
    # per-partition wedge work is Sum(k^2) over its nodes — invisible to
    # AQE (which balances BYTES). Default OFF: an A/B at 12M edges
    # measured no win (32.4-35.3 s with 8x round-robin tasks vs
    # 28.7-37.1 s without — noise), because the adjacency hash already
    # spreads hubs at these scales; the dial exists for graphs whose
    # hub mass concentrates in few partitions (set >0 for N-x
    # round-robin tasks — k^2 cost is per-ROW, so round-robin beats any
    # hash key).
    if kernel_task_factor:
        n_kernel_tasks = kernel_task_factor * int(
            oriented.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        adj = adj.repartition(n_kernel_tasks)
    cand = adj.mapInPandas(_wedge_survivors, "u long, v long, w long")
    closing = e.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = cand.join(closing.hint("shuffle_hash"), ["v", "w"], "left_semi")
    # ONE pass over tri (r15, same argument as the attach path): the
    # three-way unionAll re-executed the Python wedge kernel + semi-join
    # subtree per branch — explode the corner array instead.
    counts = tri.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    )
    return counts.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
