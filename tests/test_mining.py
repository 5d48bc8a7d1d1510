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
