"""Salted join / two-phase aggregation agree with their unsalted
equivalents on skewed data (operators/salt.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.salt import (
    salted_agg,
    salted_join,
)


def _skewed(spark):
    # 10k rows on one hot key, 100 spread over 100 keys
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(100).select(
        (F.col("id") + 2).alias("k"), F.col("id").alias("payload")
    )
    return hot.union(cold)


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold2"), (50, "cold50")], ["k", "label"]
    )
    plain = left.join(right, ["k"]).groupBy("k", "label").count()
    salted = salted_join(left, right, ["k"], salt_cols=["payload"]).groupBy(
        "k", "label"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_and_full(spark):
    """Right/full joins would emit unmatched right rows once per salt
    bucket — the helper refuses rather than silently corrupting them."""
    left = _skewed(spark)
    right = spark.createDataFrame([(1, "hot")], ["k", "label"])
    for how in ("right", "full", "outer", "cross"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, ["k"], salt_cols=["payload"], how=how)


def test_salted_join_left_anti_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(1, "hot"), (2, "cold2")], ["k", "label"])
    plain = left.join(right, ["k"], "left_anti")
    salted = salted_join(left, right, ["k"], salt_cols=["payload"], how="left_anti")
    assert plain.count() == salted.count() == 99


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("payload").alias("s"), F.count("*").alias("c")
    )
    salted = salted_agg(
        df,
        keys=["k"],
        salt_cols=["payload"],
        partial_aggs=[F.sum("payload").alias("s"), F.count("*").alias("c")],
        final_aggs=lambda: [F.sum("s").alias("s"), F.sum("c").alias("c")],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
