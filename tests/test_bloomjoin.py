"""Bloom-pruned join (operators/bloomjoin.py): the filter may pass
non-matches but must NEVER drop a matching row, and the composed semi
join must be set-exact vs the plain semi join."""
import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.metrics import shuffle_written
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


def test_bit63_words_build_warning_clean(spark):
    """A dense build sets bit 63 in some words; bit_or then returns a
    NEGATIVE BigInt that must be bit-reinterpreted, not value-converted
    (np.uint64(negative) is deprecated and raises on NumPy >= 2.0).
    The build must complete with zero DeprecationWarnings AND the high
    bits must actually be present in the bitmap."""
    build = spark.createDataFrame([(i,) for i in range(500)], ["bk"])
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        bitmap = bloomjoin.build_bloom_bitmap(build, "bk", log2_m=10)
    # 500 keys * 5 hashes over 1024 bits: bit 63 of some word is set with
    # overwhelming probability — and deterministically for the md5-derived
    # hash family, so this is a stable regression gate.
    assert bool((bitmap >> np.uint64(63) & np.uint64(1)).any())
    # no false negatives survive the signed->unsigned reinterpretation
    test = bloomjoin.might_contain_udf(bitmap, log2_m=10)
    out = build.select(test(F.col("bk").cast("long")).alias("hit")).collect()
    assert all(r["hit"] for r in out)


def test_null_build_keys_are_dropped_exactly(spark):
    """NULL build keys never equi-join; the build must skip them instead
    of crashing in the Arrow UDF's int64 cast."""
    build = spark.createDataFrame([(5,), (None,)], ["bk"])
    bitmap = bloomjoin.build_bloom_bitmap(build, "bk")
    probe = spark.createDataFrame([(1, 5), (2, 6)], ["row_id", "k"])
    out = bloomjoin.bloom_prune(probe, "k", bitmap).collect()
    assert [r["row_id"] for r in out] == [1]


def test_shuffle_reduction_is_measured(spark):
    """The operator's whole point, metric-asserted: the aggregation after
    Bloom pruning shuffles a small fraction of the records the unpruned
    aggregation shuffles (SQLMetrics shuffleRecordsWritten, not prose).
    One nation's suppliers = ~1/25 of suppkeys, so the pruned shuffle
    must be under 10% of the unpruned one."""
    from conftest import SF_ORACLE

    from weather_etl_docker_airflow_project_spark.io import load_table

    l = load_table(spark, SF_ORACLE, "lineitem")
    s = load_table(spark, SF_ORACLE, "supplier")
    n = load_table(spark, SF_ORACLE, "nation")
    build = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey")

    # Force the exact join to be a SHUFFLE join (the 100 TB shape where the
    # runtime filter pays): without pruning, all of lineitem rides the
    # exchange; with pruning, only Bloom survivors do.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        keys = build.select(F.col("s_suppkey").alias("l_suppkey")).distinct()
        unpruned_recs, unpruned_bytes = shuffle_written(
            l.join(keys, "l_suppkey", "left_semi")
        )
        bitmap = bloomjoin.build_bloom_bitmap(build, "s_suppkey")
        survivors = bloomjoin.bloom_prune(l, "l_suppkey", bitmap)
        pruned_recs, pruned_bytes = shuffle_written(
            survivors.join(keys, "l_suppkey", "left_semi")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert unpruned_recs > l.count() * 0.9  # whole fact table shuffled
    assert pruned_recs < 0.10 * unpruned_recs, (pruned_recs, unpruned_recs)
    assert pruned_bytes < 0.20 * unpruned_bytes, (pruned_bytes, unpruned_bytes)
