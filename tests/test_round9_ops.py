"""Round-9 surface: the versioned table's ROW-LEVEL change feed across
overwrite commits (read_changes_cdc) and the cell-scoped semantic
near-dup (semantic_neardup_cells) — crafted-edge coverage beyond the
driver oracles (s23_change_feed_cdc / l2_semantic_neardup_cells certify
the sf0.01 behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators import similarity
from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _feed(t, **kw):
    return sorted(
        (r["k"], r["change_type"], r["commit_version"])
        for r in t.read_changes_cdc(**kw).collect()
    )


def test_cdc_overwrite_emits_exact_keyed_diff(spark, tmp_path):
    """The r8 contract flipped: an overwrite-crossing range EMITS the
    exact insert/update/delete diff when keys are given (read_changes
    itself still refuses — that raise is pinned below)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    # overwrite: drop k=3 (delete), rewrite k=2 (update), add k=4 (insert)
    t.commit(_mk(spark, [(1, "a"), (2, "B"), (4, "d")]), mode="overwrite")
    assert _feed(t, v_from=1, keys=["k"]) == [
        (2, "update", 2),
        (3, "delete", 2),
        (4, "insert", 2),
    ]
    # the file-level reader keeps its refusal on the same range
    with pytest.raises(ValueError, match="overwrite"):
        t.read_changes(v_from=1)


def test_cdc_mixed_commits_are_per_commit_rows(spark, tmp_path):
    """Append and overwrite legs interleave; each change row carries the
    commit that produced it, so a replayer sees commit boundaries."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    t.commit(_mk(spark, [(2, "b")]), mode="append")  # v2: insert k=2
    t.commit(_mk(spark, [(1, "A"), (2, "b")]), mode="overwrite")  # v3: update k=1
    t.commit(_mk(spark, [(3, "c")]), mode="append")  # v4: insert k=3
    assert _feed(t, v_from=1, keys=["k"]) == [
        (1, "update", 3),
        (2, "insert", 2),
        (3, "insert", 4),
    ]
    # partial windows slice the same feed
    assert _feed(t, v_from=2, v_to=3, keys=["k"]) == [(1, "update", 3)]


def test_cdc_append_leg_opens_only_delta_files(spark, tmp_path):
    """The append leg must keep read_changes' O(delta) property: v1's
    batch dirs are never opened when consuming an append-only window."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(i, "x") for i in range(10)]))
    t.commit(_mk(spark, [(10, "y")]), mode="append")
    feed = t.read_changes_cdc(v_from=1, keys=["k"])
    v1_dirs = set(t._manifest(1))
    assert not any(
        any(d in f for d in v1_dirs) for f in feed.inputFiles()
    )
    assert _feed(t, v_from=1, keys=["k"]) == [(10, "insert", 2)]


def test_cdc_unkeyed_keeps_the_refusal(spark, tmp_path):
    """No keys = no row identity: crossing an overwrite without keys
    raises (the un-keyable case keeps the r8 contract), and even an
    append-only window demands keys (file-level consumers should use
    read_changes directly)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    t.commit(_mk(spark, [(2, "b")]), mode="overwrite")
    with pytest.raises(ValueError, match="keys"):
        t.read_changes_cdc(v_from=1)
    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.commit(_mk(spark, [(1, "a")]))
    t2.commit(_mk(spark, [(2, "b")]), mode="append")
    with pytest.raises(ValueError, match="read_changes"):
        t2.read_changes_cdc(v_from=1)


def test_cdc_empty_window_is_schema_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    out = t.read_changes_cdc(v_from=1, v_to=1, keys=["k"])
    assert out.columns == ["k", "change_type", "commit_version"]
    assert out.count() == 0


def test_cdc_update_detection_uses_compare_cols_only(spark, tmp_path):
    """A column outside compare_cols changing must NOT report an update
    (the fingerprint is scoped, same as snapshot_diff's contract)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, "a", 100)], ["k", "v", "noise"])
    df2 = spark.createDataFrame([(1, "a", 999)], ["k", "v", "noise"])
    t.commit(df1)
    t.commit(df2, mode="overwrite")
    assert _feed(t, v_from=1, keys=["k"], compare_cols=["v"]) == []
    assert _feed(t, v_from=1, keys=["k"]) == [(1, "update", 2)]


# ---------------------------------------------------------------------------
# semantic_neardup_cells
# ---------------------------------------------------------------------------


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["dot_q"], r["cell"]) for r in df.collect()
    }


def test_semantic_cells_exact_within_cell_scoped_outside(spark):
    """Crafted two-cluster corpus: seeds 0 and 125 pull their clusters
    into separate cells; every intra-cluster pair over threshold is
    found EXACTLY, and the (deliberately similar) cross-cluster pair is
    out of scope — the declared SemDeDup boundary trade."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.normal(size=64)
    b = -a + rng.normal(scale=0.05, size=64)  # opposite direction cluster
    rows = []
    for vid, base in ((0, a), (125, b)):  # the two seeds
        rows.append((vid, [float(x) for x in base]))
    for i, base in ((1, a), (2, a), (3, b), (4, b)):
        v = base + rng.normal(scale=0.05, size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    got = _pairs(similarity.semantic_neardup_cells(emb, threshold=0.40))
    exact = {
        (r["id_a"], r["id_b"]): r["dot_q"]
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.40).collect()
    }
    # subset of the global kernel with identical dots
    assert set(got) <= set(exact)
    for k, (dot, _cell) in got.items():
        assert exact[k] == dot
    # completeness within scope: all intra-cluster pairs found, in the
    # right cells; no cross-cluster pair (different cells by design)
    cluster_a, cluster_b = {0, 1, 2}, {125, 3, 4}
    for (ia, ib), (_, cell) in got.items():
        in_a = ia in cluster_a and ib in cluster_a
        in_b = ia in cluster_b and ib in cluster_b
        assert in_a or in_b
        assert cell == (0 if in_a else 125)
    assert {(0, 1), (0, 2), (1, 2)} <= set(got)
    assert {(3, 4), (3, 125), (4, 125)} <= set(got)


def test_semantic_cells_subset_of_exact_on_real_data(spark):
    """On the sf0.01 corpus the cell-scoped result must be exactly the
    within-cell slice of the global exact kernel — no fabricated pairs,
    no missed within-cell pair, dots identical."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cells = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_cells(emb, 125).select("vec_id", "cell").collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["dot_q"]
        for r in similarity.embedding_neardup_pairs(emb, threshold=0.40).collect()
    }
    expected = {
        k: v for k, v in exact.items() if cells[k[0]] == cells[k[1]]
    }
    got = _pairs(similarity.semantic_neardup_cells(emb, threshold=0.40))
    assert {k: v[0] for k, v in got.items()} == expected
    for (ia, ib), (_, cell) in got.items():
        assert cell == cells[ia] == cells[ib]


def test_semantic_cells_salting_path_identical(spark):
    """Forcing the triangular chunk salting (block_rows smaller than the
    largest cell) must not change the result set — the kernel's S>1
    path is byte-identical to S=1."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    plain = _pairs(similarity.semantic_neardup_cells(emb, threshold=0.40))
    salted = _pairs(
        similarity.semantic_neardup_cells(emb, threshold=0.40, block_rows=16)
    )
    assert plain == salted


# ---------------------------------------------------------------------------
# compact (OPTIMIZE)
# ---------------------------------------------------------------------------


def test_compact_shrinks_files_preserves_data_and_history(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        compact,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit(
            spark.range(i * 100, (i + 1) * 100)
            .withColumnRenamed("id", "k")
            .repartition(8),
            mode="append" if i else "overwrite",
        )
    before = sorted(r["k"] for r in t.read().collect())
    rep = compact(t)
    assert rep.files_after < rep.files_before
    assert rep.files_after == 1  # tiny data -> one right-sized file
    assert sorted(r["k"] for r in t.read().collect()) == before
    # time travel to a pre-compaction version still works (immutability)
    assert t.read(version=2).count() == 200
    # the compaction is a normal overwrite commit: file-level changes
    # refuse the range...
    with pytest.raises(ValueError, match="overwrite"):
        t.read_changes(v_from=rep.version - 1)


def test_compact_cdc_feed_sees_zero_changes(spark, tmp_path):
    """The defining invariant: compaction rewrites layout, not rows —
    a keyed CDC consumer crossing the compaction commit sees a version
    bump and an EMPTY diff."""
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        compact,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a"), (2, "b")]).repartition(4))
    t.commit(_mk(spark, [(3, "c")]).repartition(4), mode="append")
    rep = compact(t)
    assert _feed(t, v_from=rep.version - 1, keys=["k"]) == []


def test_compact_empty_table_raises(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        compact,
    )

    with pytest.raises(ValueError, match="no commits"):
        compact(VersionedTable(spark, str(tmp_path / "t")))
