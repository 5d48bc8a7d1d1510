"""Round-8 surface operators: graded n-gram contamination, snapshot
distribution drift, interval-overlap join, and the versioned table's
incremental change scan — crafted-edge coverage beyond the driver
oracles (which certify the sf0.01 behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.dedup import (
    contamination_score,
)
from weather_etl_docker_airflow_project_spark.operators.dq import (
    distribution_drift,
)
from weather_etl_docker_airflow_project_spark.operators.rangejoin import (
    interval_overlap_join,
)
from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
)


# ---------------------------------------------------------------------------
# contamination_score
# ---------------------------------------------------------------------------


def test_contamination_bounds_and_exact_pcts(spark):
    eval_df = spark.createDataFrame(
        [(100, "a b c d e f")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # 2 grams, both in eval -> 100
            (2, "z y x w v u"),        # 2 grams, none in eval -> 0
            (3, "a b c d e zzz b c d e f"),  # 7 distinct grams, 2 hits
            (4, "hi"),                 # short doc: whole run = 1 gram, miss
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_contaminated"], r["contamination_pct"])
        for r in contamination_score(train, eval_df, k=5).collect()
    }
    assert out[1] == (2, 2, 100)
    assert out[2] == (2, 0, 0)
    assert out[3] == (7, 2, 28)  # floor(200/7)
    assert out[4] == (1, 0, 0)


def test_contamination_short_eval_doc_matches_whole_run(spark):
    # eval doc shorter than k contributes its whole token run as one gram
    eval_df = spark.createDataFrame([(100, "q r")], ["doc_id", "text"])
    train = spark.createDataFrame([(1, "q r")], ["doc_id", "text"])
    row = contamination_score(train, eval_df, k=5).collect()[0]
    assert (row["n_grams"], row["contamination_pct"]) == (1, 100)


# ---------------------------------------------------------------------------
# distribution_drift
# ---------------------------------------------------------------------------


def test_drift_zero_for_identical_snapshots(spark):
    df = spark.createDataFrame([(v,) for v in range(100)], ["v"])
    out = distribution_drift(df, df, F.floor(F.col("v") / 10).cast("long"))
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["drift_micro"] == 0 for r in rows)
    assert all(r["p_micro"] == r["q_micro"] == 100000 for r in rows)


def test_drift_disjoint_buckets_total_variation_is_one(spark):
    before = spark.createDataFrame([(1,), (2,)], ["v"])
    after = spark.createDataFrame([(11,), (12,), (13,)], ["v"])
    out = distribution_drift(before, after, F.floor(F.col("v") / 10).cast("long"))
    rows = {r["bucket"]: r for r in out.collect()}
    # one-sided buckets report zero mass on the absent side
    assert rows[0]["n_after"] == 0 and rows[1]["n_before"] == 0
    tvd_micro = sum(r["drift_micro"] for r in rows.values()) // 2
    assert tvd_micro == 1_000_000  # fully disjoint => TVD = 1


def test_drift_masses_are_exact_integer_division(spark):
    before = spark.createDataFrame([(0,), (0,), (1,)], ["v"])  # 2/3, 1/3
    after = spark.createDataFrame([(0,), (1,)], ["v"])  # 1/2, 1/2
    rows = {r["bucket"]: r for r in distribution_drift(before, after, "v").collect()}
    assert rows[0]["p_micro"] == 666_666  # floor semantics, not rounding
    assert rows[0]["q_micro"] == 500_000
    assert rows[1]["drift_micro"] == abs(333_333 - 500_000)


def test_drift_empty_snapshot_fails_fast(spark):
    """r8 ADVICE: an empty before/after snapshot must raise a named error
    at execution, never silently emit NULL micro-columns (the masses
    would divide by a zero total)."""
    import pytest
    from pyspark.errors import PySparkException

    full = spark.createDataFrame([(0,), (1,)], ["v"])
    empty = full.filter(F.col("v") < 0)
    for b, a in ((empty, full), (full, empty)):
        with pytest.raises(PySparkException, match="empty before/after"):
            distribution_drift(b, a, "v").collect()
    # both sides empty: nothing to compare -> empty result, no error
    assert distribution_drift(empty, empty, "v").count() == 0


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------


def _brute_pairs(a, b):
    return sorted(
        (x[1], y[1])
        for x in a
        for y in b
        if x[0] == y[0] and x[2] < y[3] and y[2] < x[3]
    )


@pytest.mark.parametrize("width", [1, 3, 7, 100])
def test_overlap_join_matches_bruteforce_each_pair_once(spark, width):
    # (key, id, start, end): spans of wildly different lengths, touching
    # endpoints (half-open: [0,5) and [5,9) must NOT match), containment,
    # identical intervals, and spans crossing many buckets
    a = [
        (1, 10, 0, 5),
        (1, 11, 5, 9),
        (1, 12, 0, 100),
        (2, 13, 3, 4),
        (3, 14, 0, 2),
    ]
    b = [
        (1, 20, 4, 6),
        (1, 21, 0, 5),
        (1, 22, 99, 200),
        (2, 23, 3, 4),
        (3, 24, 2, 4),
    ]
    adf = spark.createDataFrame(a, ["k", "a_id", "a_s", "a_e"])
    bdf = spark.createDataFrame(b, ["k", "b_id", "b_s", "b_e"])
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            adf, bdf, ["k"], "a_s", "a_e", "b_s", "b_e", bucket_width=width
        ).collect()
    )
    assert got == _brute_pairs(a, b)  # exactly once each, none missed


def test_overlap_join_rejects_colliding_column_names(spark):
    df = spark.createDataFrame([(1, 0, 5)], ["k", "s", "e"])
    with pytest.raises(ValueError, match="distinct"):
        interval_overlap_join(df, df, ["k"], "s", "e", "s", "e", 10)


# ---------------------------------------------------------------------------
# VersionedTable.read_changes
# ---------------------------------------------------------------------------


def test_read_changes_reads_only_delta_files(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 10).withColumnRenamed("id", "k"))
    t.commit(spark.range(10, 15).withColumnRenamed("id", "k"), mode="append")
    t.commit(spark.range(15, 17).withColumnRenamed("id", "k"), mode="append")
    delta = t.read_changes(v_from=1)
    assert sorted(r["k"] for r in delta.collect()) == list(range(10, 17))
    # O(delta) file gate: no file of v1's batch dir is ever opened
    v1_dirs = set(t._manifest(1))
    touched = {f for f in delta.inputFiles()}
    assert not any(any(d in f for d in v1_dirs) for f in touched)
    # partial range
    assert sorted(
        r["k"] for r in t.read_changes(v_from=1, v_to=2).collect()
    ) == list(range(10, 15))


def test_read_changes_empty_delta_is_schema_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(3).withColumnRenamed("id", "k"))
    delta = t.read_changes(v_from=1, v_to=1)
    assert delta.columns == ["k"] and delta.count() == 0


def test_read_changes_refuses_overwrite_crossing(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(3).withColumnRenamed("id", "k"))
    t.commit(spark.range(5).withColumnRenamed("id", "k"), mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        t.read_changes(v_from=1)
