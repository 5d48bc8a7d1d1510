"""Property-based gates for the round-4 session-2 operators (batched —
one Spark job verifies the property for a whole hypothesis-generated
list, max_examples small, deadline off, same policy as
tests/test_properties.py):

- int8 quantization: range, sign preservation, and the half-step
  dequantization error bound for arbitrary float32 vectors;
- PageRank fixed point: bit-equality with the pure-Python integer
  reference on random graphs (the partitioning-independence claim);
- EWMA: convexity — the smoothed value always lies within the min/max of
  the 8-value window it averages.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from weather_etl_docker_airflow_project_spark.operators.graph import SCALE, pagerank_fixed_point
from weather_etl_docker_airflow_project_spark.operators.quantize import int8_quantize

_PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vectors = st.lists(
    st.lists(floats32, min_size=0, max_size=24), min_size=1, max_size=40
)


@_PROP
@given(vecs=vectors)
def test_quantize_properties(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in int8_quantize(df).collect()}
    for i, v in enumerate(vecs):
        mx = out[i]["max_abs"]
        q = out[i]["q"]
        assert len(q) == len(v)
        assert mx == (max(abs(float(x)) for x in v) if v else 0.0)
        for orig, qi in zip(v, q):
            assert -127 <= qi <= 127
            if mx > 0.0:
                # half-step error bound (+ float slack)
                assert abs(float(orig) - qi * mx / 127.0) <= mx / 254.0 * 1.0001
            else:
                assert qi == 0


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60
)


@_PROP
@given(raw=edge_lists)
def test_pagerank_matches_python_reference_on_random_graphs(spark, raw):
    und = {(a, b) for a, b in raw if a != b}
    if not und:
        und = {(0, 1)}
    edges = sorted(und | {(b, a) for a, b in und})
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_fixed_point(df, n_iter=3).collect()
    }
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: SCALE for n in outdeg}
    for _ in range(3):
        agg = {n: 0 for n in outdeg}
        for s, d in edges:
            agg[d] += r[s] // outdeg[s]
        r = {n: (15 * SCALE) // 100 + (85 * agg[n]) // 100 for n in outdeg}
    assert got == r


values = st.lists(
    st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


@_PROP
@given(vals=values)
def test_ewma_stays_within_window_envelope(spark, vals):
    from weather_etl_docker_airflow_project_spark.plans.timeseries_q import _EWMA_WEIGHTS  # noqa: F401

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, seq long, value double")
    w = Window.partitionBy("user_id").orderBy("seq")
    num = F.col("value")
    den = F.lit(1.0)
    for k, wt in enumerate(_EWMA_WEIGHTS[1:], start=1):
        lagk = F.lag("value", k).over(w)
        num = num + F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(float(wt)) * lagk)
        den = den + F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(float(wt)))
    out = df.select("seq", "value", (num / den).alias("ewma")).collect()
    by_seq = {r["seq"]: r["ewma"] for r in out}
    for i in range(len(vals)):
        window = vals[max(0, i - 7): i + 1]
        lo, hi = min(window), max(window)
        span = max(abs(lo), abs(hi), 1.0)
        assert lo - 1e-9 * span <= by_seq[i] <= hi + 1e-9 * span
