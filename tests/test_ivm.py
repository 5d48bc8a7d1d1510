"""Gates for incremental join-view maintenance (operators/ivm.py): the
N-batch replay must be row-identical to the one-shot join, including the
delta×delta term, empty deltas, and keys that never match."""

from __future__ import annotations

from weather_etl_docker_airflow_project_spark.io import scratch_dir
from weather_etl_docker_airflow_project_spark.operators.ivm import JoinView


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_replay_equals_one_shot_join(spark):
    r = spark.createDataFrame(
        [(k % 7, f"r{k}") for k in range(100)], "k long, rv string"
    )
    s = spark.createDataFrame(
        [(k % 5, f"s{k}") for k in range(40)], "k long, sv string"
    )
    view = JoinView(spark, scratch_dir("ivm_t1"), on="k")
    # interleaved schedule with an empty S delta and a late R delta whose
    # matches exist only in the accumulated S
    view.apply_batch(r.filter("rv < 'r3'"), s.filter("sv < 's2'"))
    view.apply_batch(r.filter("rv >= 'r3' and rv < 'r6'"), s.filter("sv >= 's2'"))
    view.apply_batch(r.filter("rv >= 'r6'"), s.limit(0))
    assert _rows(view.read()) == _rows(r.join(s, "k"))


def test_delta_delta_term_not_double_counted(spark):
    # one batch where BOTH sides are new: the ΔR⋈ΔS term must appear
    # exactly once
    r = spark.createDataFrame([(1, "a")], "k long, rv string")
    s = spark.createDataFrame([(1, "x"), (1, "y")], "k long, sv string")
    view = JoinView(spark, scratch_dir("ivm_t2"), on="k")
    view.apply_batch(r, s)
    assert _rows(view.read()) == _rows(r.join(s, "k"))
    # second batch: new R rows match only accumulated S
    r2 = spark.createDataFrame([(1, "b"), (2, "c")], "k long, rv string")
    view.apply_batch(r2, s.limit(0))
    assert _rows(view.read()) == _rows(
        r.unionByName(r2).join(s, "k")
    )


def test_torn_batch_replay_is_idempotent(spark):
    """Stage-then-manifest gate: a batch that staged data but never landed
    its manifest marker (crash between write and commit) must be invisible
    to readers, and replaying it must produce exactly-once content — no
    double counting of the torn attempt's rows."""
    import os

    r = spark.createDataFrame([(1, "a"), (2, "b")], "k long, rv string")
    s = spark.createDataFrame([(1, "x"), (2, "y")], "k long, sv string")
    base = scratch_dir("ivm_torn")
    view = JoinView(spark, base, on="k")
    view.apply_batch(r.filter("k = 1"), s.filter("k = 1"))
    settled = _rows(view.read())

    # simulate a torn batch 1: stage all three families, then "crash"
    # before the manifest marker by deleting it
    view.apply_batch(r.filter("k = 2"), s.filter("k = 2"))
    os.remove(os.path.join(base, "_commits", "1"))
    # reader sees only the committed prefix
    assert _rows(view.read()) == settled
    assert view.committed_batches() == [0]

    # replay of the torn batch id overwrites its own partial staging
    replayed = view.apply_batch(r.filter("k = 2"), s.filter("k = 2"), batch_id=1)
    assert replayed == 1
    assert _rows(view.read()) == _rows(r.join(s, "k"))

    # replaying an ALREADY-committed id is a durable no-op
    again = view.apply_batch(r.filter("k = 2"), s.filter("k = 2"), batch_id=1)
    assert again == 1
    assert _rows(view.read()) == _rows(r.join(s, "k"))


def test_committed_batch_with_missing_data_raises(spark):
    """A manifest marker guarantees its staged dirs exist; if one goes
    missing (external cleanup, wrong sink contents) the view must fail
    LOUDLY rather than silently serve a smaller-but-plausible result."""
    import os
    import shutil

    import pytest

    r = spark.createDataFrame([(1, "a")], "k long, rv string")
    s = spark.createDataFrame([(1, "x")], "k long, sv string")
    base = scratch_dir("ivm_corrupt")
    view = JoinView(spark, base, on="k")
    view.apply_batch(r, s)
    shutil.rmtree(os.path.join(base, "m_acc", "batch_0"))
    with pytest.raises(ValueError, match="committed batch data missing"):
        view.read()
