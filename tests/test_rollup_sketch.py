"""Gates for the sketch-based incremental rollup (a17): the HLL column's
whole value proposition is that incremental maintenance loses NOTHING vs a
one-shot aggregation — DataSketches HLL union is register-wise max, so for
the same lgK and the same input set the merged sketch estimates exactly
what the one-shot sketch estimates, regardless of batching. That property
plus the error bound vs exact distinct are the a17 contract (no SQL oracle
exists for sketch bytes)."""

import os

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir
from weather_etl_docker_airflow_project_spark.operators.rollup import (
    HLL_LGK,
    maintain_sketch_rollup,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def incremental(spark):
    e = load_table(spark, SF, "events")
    sink = os.path.join(scratch_dir("sketch_rollup_test_"), "daily")
    out = None
    for b in range(5):
        out = maintain_sketch_rollup(
            spark, sink, e.filter(F.col("event_id") % 5 == b)
        )
    return {
        r["day"]: (r["n_events"], r["approx"])
        for r in out.select(
            "day",
            "n_events",
            F.hll_sketch_estimate("users_hll").cast("long").alias("approx"),
        ).collect()
    }


def test_incremental_sketch_equals_one_shot(spark, incremental):
    """Five-batch maintenance must estimate EXACTLY what a single
    aggregation over all events estimates — merge associativity for the
    sketch column (the a16 hash-match twin, minus the SQL oracle)."""
    e = load_table(spark, SF, "events")
    oneshot = {
        r["day"]: (r["n_events"], r["approx"])
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).cast("long").alias("approx"),
        )
        .collect()
    }
    assert incremental == oneshot


def test_sketch_estimate_error_bound(spark, incremental):
    """lgK=12 -> ~1.6% RSE; gate at 5% vs the exact distinct count."""
    e = load_table(spark, SF, "events")
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(incremental) == set(exact)
    for day, (_n_events, approx) in incremental.items():
        assert abs(approx - exact[day]) / exact[day] < 0.05, (
            day, approx, exact[day],
        )
