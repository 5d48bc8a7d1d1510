"""Semantics gates for the round-4 batch operators: exact heavy hitters
(candidate+recount), CDC snapshot differencing, and the time-series
linear-interpolation identity on crafted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.cdc import snapshot_diff
from weather_etl_docker_airflow_project_spark.operators.heavyhitters import heavy_hitters


def test_heavy_hitters_exact_on_skew(spark):
    # zipf-ish crafted skew: key k appears 2**(10-k) times for k in 0..9,
    # plus a long tail of singletons
    rows = [(k,) for k in range(10) for _ in range(2 ** (10 - k))]
    rows += [(1000 + i,) for i in range(500)]
    df = spark.createDataFrame(rows, "key long").repartition(8)
    got = {
        (r["key"], r["n"])
        for r in heavy_hitters(df, "key", k=5, capacity=256).collect()
    }
    want = {(k, 2 ** (10 - k)) for k in range(5)}
    assert got == want


def test_heavy_hitters_refuses_uncertifiable(spark):
    # 600 distinct singletons, k=5, capacity 8: kth count 1 <= N/(C+1)
    df = spark.createDataFrame([(i,) for i in range(600)], "key long").repartition(4)
    with pytest.raises(ValueError, match="certify"):
        heavy_hitters(df, "key", k=5, capacity=8)


def test_heavy_hitters_tail_never_inflates(spark):
    # the recount pass must produce EXACT counts even though the candidate
    # pass undercounts: a key spread thinly across partitions still gets
    # its true global count if it survives candidacy
    rows = [(7,)] * 40 + [(i,) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "key long").repartition(8)
    top = heavy_hitters(df, "key", k=1, capacity=64).collect()
    assert [(r["key"], r["n"]) for r in top] == [(7, 40)]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, status string, price string")


def test_snapshot_diff_classifies(spark):
    old = _snap(spark, [(1, "A", "10"), (2, "B", "20"), (3, "C", "30")])
    new = _snap(spark, [(2, "B", "20"), (3, "X", "30"), (4, "D", "40")])
    got = {
        (r["id"], r["change_type"])
        for r in snapshot_diff(old, new, ["id"], ["status", "price"]).collect()
    }
    assert got == {(1, "delete"), (3, "update"), (4, "insert")}


def test_snapshot_diff_null_not_empty_collision(spark):
    # (NULL, 'x') must differ from ('', 'x') and from (' null', 'x') —
    # the coalesce sentinel keeps the fingerprint injective enough that a
    # NULL->'' transition is detected as an update
    old = _snap(spark, [(1, None, "x"), (2, " null", "x")])
    new = _snap(spark, [(1, "", "x"), (2, " null", "x")])
    got = {
        (r["id"], r["change_type"])
        for r in snapshot_diff(old, new, ["id"], ["status", "price"]).collect()
    }
    assert got == {(1, "update")}


def test_snapshot_diff_unchanged_is_empty(spark):
    old = _snap(spark, [(1, "A", "10"), (2, "B", None)])
    assert snapshot_diff(old, old, ["id"], ["status", "price"]).count() == 0


def test_linear_interpolation_crafted(spark):
    # one user, hours 0,1,2,3 with observations at 0 (v=10) and 3 (v=40):
    # hours 1,2 must interpolate to 20, 30 exactly
    from weather_etl_docker_airflow_project_spark.plans.timeseries_q import (
        ts6_linear_interpolation,
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="ts6")
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-01 03:30:00", 1, "view", 40.0, "{}"),
        (3, "2024-01-01 03:40:00", 1, "view", 35.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["hr"].hour, r["value_filled"], r["is_interpolated"])
        for r in ts6_linear_interpolation(spark, d).collect()
    }
    assert out == {(0, 10.0, False), (1, 20.0, True), (2, 30.0, True), (3, 40.0, False)}


def test_skyline_dominance_with_ties(spark):
    """Crafted frontier spanning bucket boundaries and same-instant ties:
    the two-level scan must equal the naive dominance definition."""
    from weather_etl_docker_airflow_project_spark.operators.skyline import skyline_2d

    rows = [
        # (key, ts, value)
        (1, "2024-01-05", 10.0),   # frontier (first)
        (2, "2024-01-20", 10.0),   # dominated: earlier equal value exists
        (3, "2024-02-02", 15.0),   # frontier (cross-bucket comparison)
        (4, "2024-02-02", 15.0),   # frontier too: tie in BOTH dims, neither strict
        (5, "2024-02-02", 12.0),   # dominated same-instant by 15.0
        (6, "2024-03-01", 14.0),   # dominated by Feb's 15.0 via bucket prefix
        (7, "2024-03-09", 99.0),   # frontier
        (8, "2024-12-31", 98.0),   # dominated across many empty buckets
    ]
    df = spark.createDataFrame(rows, "k long, ts string, v double").withColumn(
        "ts", (F.col("ts")).cast("timestamp")
    )
    got = {r["k"] for r in skyline_2d(df, "ts", "v").collect()}
    # naive check computed in python
    naive = {
        k
        for (k, t, v) in rows
        if not any(
            (t2 <= t and v2 >= v and (t2 < t or v2 > v))
            for (k2, t2, v2) in rows
            if k2 != k
        )
    }
    assert got == naive == {1, 3, 4, 7}


def test_countmin_overestimates_and_is_exact_when_collision_free(spark):
    """CMS contract: estimates never undercount; with width >> keys the
    probability all 4 rows collide is nil, so estimates are exact; with
    width=1 every row collides and the estimate equals the total row
    count."""
    from pyspark.sql import functions as F

    from weather_etl_docker_airflow_project_spark.operators.heavyhitters import (
        countmin_estimate,
        countmin_sketch,
    )

    data = [(k,) for k in [1] * 10 + [2] * 5 + [3] * 2 + [4] * 1]
    df = spark.createDataFrame(data, "k long")
    exact = {1: 10, 2: 5, 3: 2, 4: 1}
    keys = df.select("k").distinct()

    sk = countmin_sketch(df, "k", depth=4, width=1024)
    est = {
        r["k"]: r["n_est"]
        for r in countmin_estimate(sk, keys, "k", depth=4, width=1024).collect()
    }
    assert est == exact  # wide sketch: collision-free -> exact

    sk1 = countmin_sketch(df, "k", depth=4, width=1)
    est1 = {
        r["k"]: r["n_est"]
        for r in countmin_estimate(sk1, keys, "k", depth=4, width=1).collect()
    }
    assert all(est1[k] == 18 for k in exact)  # total mass in the one cell

    # sketch is bounded: never more than depth x width cells
    assert sk.count() <= 4 * 1024 and sk1.count() == 4

    # mergeability: sketch(a ∪ b) == cellwise sum of sketch(a), sketch(b)
    a = df.filter(F.col("k") <= 2)
    b = df.filter(F.col("k") > 2)
    merged = (
        countmin_sketch(a, "k", 4, 64)
        .unionByName(countmin_sketch(b, "k", 4, 64))
        .groupBy("row", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = countmin_sketch(df, "k", 4, 64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}
