"""Bloom-pruned join (operators/bloomjoin.py): the filter may pass
non-matches but must NEVER drop a matching row, and the composed semi
join must be set-exact vs the plain semi join."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators import bloomjoin


@pytest.fixture(scope="module")
def tables(spark):
    probe = spark.createDataFrame(
        [(i, i % 1000) for i in range(20000)], ["row_id", "k"]
    )
    build = spark.createDataFrame([(j * 97,) for j in range(10)], ["bk"])
    return probe, build


def test_no_false_negatives(spark, tables):
    probe, build = tables
    bitmap = bloomjoin.build_bloom_bitmap(build, "bk")
    pruned = bloomjoin.bloom_prune(probe, "k", bitmap)
    true_keys = {r["bk"] % 1000 for r in build.collect()} & set(range(1000))
    surviving = {r["k"] for r in pruned.collect()}
    # every key that CAN match build (mod collisions aside: build keys
    # <1000 here are j*97 for j<11) must survive the filter
    must_pass = {j * 97 for j in range(10)} & set(range(1000))
    assert must_pass <= surviving, true_keys


def test_pruning_actually_drops(spark, tables):
    probe, build = tables
    bitmap = bloomjoin.build_bloom_bitmap(build, "bk")
    pruned_n = bloomjoin.bloom_prune(probe, "k", bitmap).count()
    # 10 of 1000 key values match; with fpp ~2^-13 the survivor count
    # should be very close to 10/1000 of the probe
    assert pruned_n < probe.count() * 0.05
    assert pruned_n >= 10 * 20  # 20 rows per key value


def test_semi_join_exactness(spark, tables):
    probe, build = tables
    got = sorted(
        r["row_id"]
        for r in bloomjoin.bloom_pruned_semi_join(
            probe, build, "k", "bk"
        ).collect()
    )
    want = sorted(
        r["row_id"]
        for r in probe.join(
            build.select(F.col("bk").alias("k")).distinct(), "k", "left_semi"
        ).collect()
    )
    assert got == want


def test_null_probe_keys_are_pruned(spark):
    probe = spark.createDataFrame([(1, 5), (2, None)], ["row_id", "k"])
    build = spark.createDataFrame([(5,)], ["bk"])
    bitmap = bloomjoin.build_bloom_bitmap(build, "bk")
    out = bloomjoin.bloom_prune(probe, "k", bitmap).collect()
    assert [r["row_id"] for r in out] == [1]


def test_bitmap_is_sketch_sized(spark, tables):
    _, build = tables
    bitmap = bloomjoin.build_bloom_bitmap(build, "bk", log2_m=16)
    assert bitmap.dtype == np.uint64 and len(bitmap) == (1 << 16) // 64
