"""Crafted-edge gates for the round-4 session-2 operators, beyond what
the sf0.01 oracles exercise: CDC apply with inserts/deletes-only/empty
feeds, the as-of tolerance boundary, and streak decomposition extremes."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.cdc import apply_changelog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_apply_changelog_edge_feeds(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    # upsert of an existing key + INSERT of a brand-new key + delete
    ch = spark.createDataFrame(
        [(2, "U", "B2"), (9, "U", "NEW"), (3, "D", None)],
        "k long, op string, v string",
    )
    got = _rows(apply_changelog(base, ch, keys=["k"]))
    assert got == [(1, "a"), (2, "B2"), (9, "NEW")]
    # deletes-only feed
    ch_d = spark.createDataFrame([(1, "D", None)], "k long, op string, v string")
    assert _rows(apply_changelog(base, ch_d, keys=["k"])) == [(2, "b"), (3, "c")]
    # empty feed is the identity
    assert _rows(apply_changelog(base, ch.limit(0), keys=["k"])) == _rows(base)


def test_apply_changelog_rejects_unknown_and_null_ops(spark):
    """Op gate (r5 review): an op outside {'U','D'} raises BEFORE any base
    row is touched — including NULL, which three-valued isin() logic would
    otherwise slide past — because an unknown op would silently delete its
    key (anti-joined out, never re-inserted)."""
    import pytest

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    ch_i = spark.createDataFrame(
        [(1, "I", "x")], "k long, op string, v string"
    )
    with pytest.raises(ValueError, match="unexpected op 'I'"):
        apply_changelog(base, ch_i, keys=["k"])
    ch_null = spark.createDataFrame(
        [(2, None, "y")], "k long, op string, v string"
    )
    with pytest.raises(ValueError, match="unexpected op"):
        apply_changelog(base, ch_null, keys=["k"])


def test_asof_tolerance_boundary(spark):
    from weather_etl_docker_airflow_project_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    clicks = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 1, 11, 30, 0)),  # exactly 30min before
            (101, 2, datetime(2024, 1, 1, 11, 29, 59)),  # 30min 1s before
        ],
        "click_id long, user_id long, ts timestamp",
    )
    errors = spark.createDataFrame(
        [(1, 1, t0), (2, 2, t0)], "event_id long, user_id long, ts timestamp"
    )
    j = asof_join(errors, clicks, on="ts", by="user_id",
                  right_payload=["click_id", "ts"], suffix="_m")
    within = F.col("ts_m") >= F.col("ts") - F.expr("INTERVAL 30 MINUTE")
    out = {
        r["event_id"]: r["click_id_tol"]
        for r in j.select(
            "event_id", F.when(within, F.col("click_id_m")).alias("click_id_tol")
        ).collect()
    }
    assert out[1] == 100   # ts_m == ts - 30min: inclusive boundary kept
    assert out[2] is None  # one second staler: nulled


def test_streak_extremes(spark):
    from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: F401 — registry import path sanity
    from pyspark.sql import Window

    rows = (
        [(1, i, float(i)) for i in range(5)]        # strictly increasing
        + [(2, i, float(-i)) for i in range(5)]     # strictly decreasing
        + [(3, i, 7.0) for i in range(4)]           # constant (not strict)
    )
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    w = Window.partitionBy("user_id").orderBy("seq")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("value").over(w)
    brk = F.when(prev.isNull() | (F.col("value") <= prev), 1).otherwise(0)
    runs = (
        df.withColumn("island", F.sum(brk).over(run))
        .groupBy("user_id", "island")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("longest"), F.count(F.lit(1)).alias("n_runs"))
    )
    got = {r["user_id"]: (r["longest"], r["n_runs"]) for r in runs.collect()}
    assert got[1] == (5, 1)  # one unbroken run
    assert got[2] == (1, 5)  # every step breaks
    assert got[3] == (1, 4)  # constants are not strict increases


def test_parameterized_sql_binds_literals_not_syntax(spark):
    """A hostile parameter value must bind as a LITERAL, never splice
    SQL — the property that makes :named parameters injection-safe."""
    from weather_etl_docker_airflow_project_spark.io import load_table

    load_table(spark, "/root/testdata/sf0.001", "orders").createOrReplaceTempView(
        "orders_inj"
    )
    clean = spark.sql(
        "SELECT count(*) AS n FROM orders_inj WHERE o_orderstatus = :s",
        args={"s": "O"},
    ).collect()[0]["n"]
    # classic injection payload: as a bound literal it matches NOTHING
    hostile = spark.sql(
        "SELECT count(*) AS n FROM orders_inj WHERE o_orderstatus = :s",
        args={"s": "O' OR '1'='1"},
    ).collect()[0]["n"]
    assert clean > 0 and hostile == 0
