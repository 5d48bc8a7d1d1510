"""Round-9 surface: the versioned table's ROW-LEVEL change feed across
overwrite commits (read_changes_cdc) — crafted-edge coverage beyond the
driver oracle (s23_change_feed_cdc certifies the sf0.01 behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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
