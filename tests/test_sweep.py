"""Property tests for the generic two-pass distributed prefix
(operators/sweep.two_pass_prefix): randomized equivalence against the
textbook single-window formulation.

The operator's contract (sweep.py docstring) is that when ``bucket_col``
is a coarse MONOTONE prefix of the ``(part_cols, bucket_col, order_cols)``
total order, the decomposed prefix sum equals
``sum(val) OVER (PARTITION BY part ORDER BY bucket, order)`` row for row.
Use-site oracles certify this for the four production call sites; this
test certifies the REUSABLE CORE for arbitrary data (skewed buckets,
empty mid-range buckets, one-bucket degeneracy, negative values,
multi-part partitions), so future call sites inherit a tested operator
rather than a convention."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window, functions as F

from weather_etl_docker_airflow_project_spark.operators.sweep import (
    bucketed_row_number,
    two_pass_prefix,
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# rows: (part, order_key, value). Bucket derives from order_key's high
# bits — monotone in order_key by construction, skewed/empty buckets
# arise naturally from the generated distribution.
rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # part key: exercises multi-part partitions
        st.integers(0, 1023),  # order key
        st.integers(-50, 50),  # value: negatives must decompose too
    ),
    min_size=1,
    max_size=120,
)


def _frame(spark, data):
    df = spark.createDataFrame(
        [(p, o, v, i) for i, (p, o, v) in enumerate(data)],
        ["part", "ok", "val", "rid"],
    )
    # bucket = high bits of the order key: a coarse monotone prefix of
    # (ok, rid); shift 8 -> at most 4 buckets, often 1 (degenerate case)
    return df.withColumn("bkt", F.shiftright("ok", 8).cast("int"))


@given(data=rows)
@SLOW
def test_two_pass_prefix_equals_single_window(spark, data):
    df = _frame(spark, data)
    got = two_pass_prefix(
        df, "bkt", ["ok", "rid"], "val", "cum", part_cols=("part",),
        total_col="tot",
    )
    w = (
        Window.partitionBy("part")
        .orderBy("bkt", "ok", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("val").over(w)).withColumn(
        "tot", F.sum("val").over(Window.partitionBy("part"))
    )
    key = lambda r: (r["part"], r["rid"])
    got_m = {key(r): (r["cum"], r["tot"]) for r in got.collect()}
    want_m = {key(r): (r["cum"], r["tot"]) for r in want.collect()}
    assert got_m == want_m


@given(data=rows)
@SLOW
def test_bucketed_row_number_equals_window_row_number(spark, data):
    df = _frame(spark, data)
    got = bucketed_row_number(df, "bkt", ["ok", "rid"], out_col="pos")
    w = Window.orderBy("bkt", "ok", "rid")
    want = df.withColumn("pos", F.row_number().over(w).cast("long"))
    got_m = {r["rid"]: r["pos"] for r in got.collect()}
    want_m = {r["rid"]: r["pos"] for r in want.collect()}
    assert got_m == want_m


def test_two_pass_prefix_violated_contract_is_detectable(spark):
    """Anti-test documenting the contract boundary: a bucket column that
    is NOT monotone in the order breaks equivalence (the operator cannot
    detect this itself — order_cols may be any expression — so the
    contract lives in the docstring and this pin)."""
    data = [(0, 5, 1), (0, 300, 1), (0, 600, 1)]
    df = spark.createDataFrame(
        [(p, o, v, i) for i, (p, o, v) in enumerate(data)],
        ["part", "ok", "val", "rid"],
    )
    bad = df.withColumn("bkt", (F.col("ok") % 2).cast("int"))  # non-monotone
    got = two_pass_prefix(bad, "bkt", ["ok", "rid"], "val", "cum")
    w = Window.orderBy("ok", "rid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("val").over(w))
    got_m = {r["rid"]: r["cum"] for r in got.collect()}
    want_m = {r["rid"]: r["cum"] for r in want.collect()}
    assert got_m != want_m  # the misuse is visible, not silently equal
