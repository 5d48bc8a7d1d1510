"""Semantics gates for the mining surface: fixed-point PageRank against a
pure-Python reimplementation of the SAME integer update rule (bit-exact,
partitioning-independent), and its rank-ordering sanity on a star graph."""

from __future__ import annotations

from weather_etl_docker_airflow_project_spark.operators.graph import SCALE, pagerank_fixed_point


def _pagerank_py(edges: list[tuple[str, str]], n_iter: int) -> dict[str, int]:
    """Driver-side reference: identical BIGINT update rule, plain dicts."""
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: SCALE for n in outdeg}
    for _ in range(n_iter):
        agg = {n: 0 for n in outdeg}
        for s, d in edges:
            agg[d] = agg.get(d, 0) + r[s] // outdeg[s]
        r = {n: (15 * SCALE) // 100 + (85 * agg.get(n, 0)) // 100 for n in outdeg}
    return r


def test_pagerank_matches_python_reference_bit_exact(spark):
    # small undirected "barbell": two triangles bridged by one edge
    und = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "e"), ("e", "f"), ("f", "d"),
        ("c", "d"),
    ]
    edges = und + [(d, s) for s, d in und]
    df = spark.createDataFrame(edges, "src string, dst string").repartition(7)
    got = {r["node"]: r["rank_scaled"] for r in pagerank_fixed_point(df, n_iter=4).collect()}
    want = _pagerank_py(edges, 4)
    assert got == want  # bit-exact: integer arithmetic is order-free


def test_pagerank_star_center_dominates(spark):
    leaves = [f"l{i}" for i in range(8)]
    und = [("hub", leaf) for leaf in leaves]
    edges = und + [(d, s) for s, d in und]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = {r["node"]: r["rank_scaled"] for r in pagerank_fixed_point(df, n_iter=4).collect()}
    assert ranks["hub"] > max(ranks[leaf] for leaf in leaves)
    # all leaves are symmetric -> identical integer ranks
    assert len({ranks[leaf] for leaf in leaves}) == 1


def test_triangle_counts_crafted_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant
    path 4-5-6 (closes nothing): exact per-node counts, path nodes
    absent from the output."""
    from weather_etl_docker_airflow_project_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "a long, b long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # broadcast hint must not change values
    got_b = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(edges, broadcast_adj=True).collect()
    }
    assert got_b == got


def test_triangle_counts_matches_bruteforce_random(spark):
    """Randomized parity vs an itertools brute force, including skewed
    degrees (a hub node) so the orientation path is exercised."""
    import itertools
    import random
    from collections import Counter

    from weather_etl_docker_airflow_project_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    n = 40
    es = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.12}
    es |= {(0, b) for b in range(1, n, 2)}  # hub
    adj = {v: set() for v in range(n)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    want: Counter = Counter()
    for u, v, w in itertools.combinations(range(n), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            want.update((u, v, w))
    edges = spark.createDataFrame(sorted(es), "a long, b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {k: v for k, v in want.items()}
