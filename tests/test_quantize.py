"""Gates for mapInArrow int8 quantization (operators/quantize.py):
edge vectors (all-zero, empty, negative, singleton) and the dequantization
error bound that makes int8 serving usable."""

from __future__ import annotations

import math

from weather_etl_docker_airflow_project_spark.operators.quantize import int8_quantize


def _quantize(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {r["vec_id"]: r for r in int8_quantize(df).collect()}


def test_edge_vectors(spark):
    out = _quantize(
        spark,
        [
            (1, [1.0, -1.0, 0.5]),
            (2, [0.0, 0.0]),          # all-zero -> zeros, max_abs 0
            (3, []),                   # empty vector survives
            (4, [-2.0]),               # singleton negative
        ],
    )
    assert out[1]["q"] == [127, -127, 64]  # floor(63.5+0.5) = 64 (half-up)
    assert out[1]["max_abs"] == 1.0
    assert out[2]["q"] == [0, 0] and out[2]["max_abs"] == 0.0
    assert out[3]["q"] == [] and out[3]["max_abs"] == 0.0
    assert out[4]["q"] == [-127] and out[4]["max_abs"] == 2.0


def test_dequantization_error_bound(spark):
    # |v - q*max_abs/127| <= max_abs/254 (half a quantization step)
    vecs = [
        (i, [math.sin(i * 17 + j) * (1 + i) for j in range(16)]) for i in range(40)
    ]
    rows = [(i, [float(x) for x in v]) for i, v in vecs]
    out = _quantize(spark, rows)
    for i, v in vecs:
        mx = out[i]["max_abs"]
        for orig, q in zip(v, out[i]["q"]):
            assert abs(orig - q * mx / 127.0) <= mx / 254.0 + 1e-9
            assert -127 <= q <= 127


def test_partitioned_input_consistent(spark):
    rows = [(i, [float(i), float(-i), 0.25]) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {r["vec_id"]: tuple(r["q"]) for r in int8_quantize(df).collect()}
    b = {
        r["vec_id"]: tuple(r["q"])
        for r in int8_quantize(df.repartition(13)).collect()
    }
    assert a == b  # partitioning-independent


def test_null_embedding_rows_stay_null(spark):
    rows = [(1, [2.0, -1.0]), (2, None), (3, []), (4, [0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in int8_quantize(df).collect()}
    assert out[2]["q"] is None and out[2]["max_abs"] is None  # NULL in -> NULL out
    assert out[3]["q"] == [] and out[3]["max_abs"] == 0.0     # empty stays empty
    # floor(x+0.5) half-up: -63.5 -> -63 (same on the vectorized path)
    assert out[1]["q"] == [127, -63]
    assert out[4]["q"] == [127]
