"""Round-16 optimization pins: internals that changed this round keep
their declared shapes and semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from weather_etl_docker_airflow_project_spark.operators import dedup


def _formatted_plan(df):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_capped_grouped_expansion_prefilters_hot_without_sorts(spark):
    """r16 (ADVICE): the capped jaccard/containment path must drop hot
    shingles BEFORE building any per-shingle id list (bounded aggregation
    buffers under boilerplate skew), via a sort-free shuffled-hash
    anti-join whose probe-side partitioning the grouped collect reuses —
    no SortMergeJoin, no Sort, and no exchange between the join and the
    collect aggregate."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} x{i} y{i}") for i in range(12)],
        ["doc_id", "text"],
    )
    sh = dedup.shingles(docs, "doc_id", "text", 3)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 4)
        .select("shingle")
    )
    grouped = (
        sh.join(hot.hint("shuffle_hash"), "shingle", "left_anti")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
        .filter(F.size("ids") <= 4)
    )
    plan = _formatted_plan(grouped)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
    # the collect aggregate must sit directly on the join output: the
    # anti-join's hash(shingle) partitioning is reused, so the segment
    # between "ShuffledHashJoin" and the aggregates has no Exchange
    join_pos = plan.index("ShuffledHashJoin")
    agg_pos = plan.index("ObjectHashAggregate")
    assert agg_pos < join_pos  # tree prints top-down: aggregate above join
    assert "Exchange" not in plan[agg_pos:join_pos]


def test_deferred_merge_validation_publishes_nothing(spark, tmp_path):
    """r16: on the full-rewrite merge path the duplicate-key validation
    runs concurrently with the batch write and is checked before the
    manifest publish — an ambiguous merge must still raise the Delta
    error AND publish no version (the staged batch stays unreferenced),
    on both the plain and the CDF-enabled path; NULL-key source rows
    stay legal."""
    from pyspark.sql import Row

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        VersionedTable,
        merge_upsert,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    dup = spark.createDataFrame([Row(k=1, v="x"), Row(k=1, v="y")])
    with pytest.raises(ValueError, match="duplicate merge-key"):
        merge_upsert(t, dup, keys=["k"])
    assert t.versions() == [1]
    assert t.read().count() == 2
    # NULL merge keys never match and must not trip the ambiguity error
    ok = spark.createDataFrame([Row(k=None, v="n"), Row(k=3, v="c")])
    assert merge_upsert(t, ok, keys=["k"]) == 2
    assert t.read().count() == 4

    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.enable_change_data_feed()
    t2.commit(spark.createDataFrame([Row(k=1, v="a")]))
    with pytest.raises(ValueError, match="duplicate merge-key"):
        merge_upsert(t2, dup, keys=["k"])
    assert t2.versions() == [1]  # the concurrent CDF staging is torn too


def test_capped_jaccard_prefilter_result_identical(spark):
    """The pre-filter is semantics-preserving: same pairs, same counts as
    the declared capped contract (hot shingles out of the universe)."""
    hot = [
        (i, f"common boiler plate unique{i} word{i} token{i} extra{i} pad{i}")
        for i in range(1, 31)
    ]
    true_pair = [
        (100, "alpha beta gamma delta epsilon zeta eta"),
        (101, "alpha beta gamma delta epsilon zeta theta"),
    ]
    df = spark.createDataFrame(hot + true_pair, ["doc_id", "text"])
    rows = dedup.containment_pairs(
        df, "doc_id", "text", threshold_pct=50, min_shingles=1,
        max_shingle_df=10,
    ).collect()
    got = {(r["id_sub"], r["id_sup"]) for r in rows}
    assert got == {(100, 101), (101, 100)}
