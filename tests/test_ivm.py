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
