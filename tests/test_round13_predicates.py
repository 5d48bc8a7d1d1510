"""Round-13 gates: the disjunctive predicate grammar (OR / NOT /
IS [NOT] NULL / != / parentheses) across parsing, 3VL fidelity, DNF
pruning soundness, pandas Kleene evaluation, and the DML surface.

The soundness contract everywhere: a pruned scan / scoped DML returns
exactly what the equivalent full-scan filter returns — DNF pruning may
change which dirs are OPENED, never which rows come back.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.predicate import (
    atom_columns,
    eval_pandas,
    parse_predicate,
    to_column,
    to_dnf,
)
from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    _dir_may_match,
    delete_where,
    update_where,
)

# predicates exercised against Spark's own evaluation of the SAME string
# — the parser's NOT pushdown must be 3VL-equivalent, so F.expr(p) and
# to_column(parse(p)) must agree row-for-row including NULL handling
PREDICATES = [
    "k > 5 OR s IS NULL",
    "NOT (k > 5 AND s = 'x')",
    "k NOT IN (1, 2, 3)",
    "k NOT BETWEEN 2 AND 7 AND s IS NOT NULL",
    "(k = 1 OR k = 2) AND (v < 3.5 OR s != 'x')",
    "NOT (k IS NULL OR v >= 5.0)",
    "k != 4",
    "s IN ('x', 'y') OR v BETWEEN 1.5 AND 2.5",
    "NOT NOT k <= 3",
]


def _null_frame(spark):
    rows = [
        Row(k=k, s=s, v=v)
        for k, s, v in [
            (1, "x", 1.0),
            (2, None, 2.0),
            (3, "y", None),
            (None, "x", 4.0),
            (5, None, None),
            (None, None, 6.5),
            (7, "z", 7.0),
            (8, "x", 8.0),
        ]
    ]
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("s", StringType()),
            StructField("v", DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _nsort(tuples):
    return sorted(tuples, key=lambda t: tuple((x is None, x) for x in t))


@pytest.mark.parametrize("pred", PREDICATES)
def test_parsed_column_matches_spark_expr(spark, pred):
    df = _null_frame(spark)
    ours = _nsort(
        (r.k, r.s, r.v) for r in df.filter(to_column(parse_predicate(pred))).collect()
    )
    sparks = _nsort((r.k, r.s, r.v) for r in df.filter(F.expr(pred)).collect())
    assert ours == sparks


@pytest.mark.parametrize("pred", PREDICATES)
def test_eval_pandas_matches_spark(spark, pred):
    df = _null_frame(spark)
    pdf = df.toPandas().convert_dtypes()
    res = eval_pandas(parse_predicate(pred), pdf)
    kept = _nsort(
        (
            None if pd.isna(r.k) else int(r.k),
            None if pd.isna(r.s) else r.s,
            None if pd.isna(r.v) else float(r.v),
        )
        for r in pdf[res.fillna(False).astype(bool)].itertuples()
    )
    sparks = _nsort((r.k, r.s, r.v) for r in df.filter(F.expr(pred)).collect())
    assert kept == sparks


def test_dnf_shapes():
    dnf = to_dnf(parse_predicate("(a = 1 OR a = 2) AND b < 3"))
    assert dnf == [[("a", "=", 1), ("b", "<", 3)], [("a", "=", 2), ("b", "<", 3)]]
    assert atom_columns(parse_predicate("a > 1 OR `b c` IS NULL")) == {"a", "b c"}
    with pytest.raises(ValueError, match="exceeds"):
        to_dnf(
            parse_predicate(
                " AND ".join(f"(a = {i} OR b = {i})" for i in range(8))
            )
        )


def test_dir_may_match_new_ops():
    stats = {
        "k": {"lo": ["n", "5"], "hi": ["n", "5"], "nulls": 0, "rows": 10},
        "s": {"lo": ["s", "a"], "hi": ["s", "m"], "nulls": 3, "rows": 10},
        "t": {"lo": ["s", "a"], "hi": ["s", "m"], "nulls": 0, "rows": 10},
    }
    # constant column: != its constant is provably empty
    assert not _dir_may_match(stats, [("k", "!=", 5)])
    assert _dir_may_match(stats, [("k", "!=", 6)])
    # null-count driven IS NULL / IS NOT NULL pruning
    assert _dir_may_match(stats, [("s", "isnull", None)])
    assert not _dir_may_match(stats, [("t", "isnull", None)])
    assert _dir_may_match(stats, [("t", "notnull", None)])
    all_null = {"s": {"lo": None, "hi": None, "nulls": 4, "rows": 4}}
    assert _dir_may_match(all_null, [("s", "isnull", None)])
    assert not _dir_may_match(all_null, [("s", "notnull", None)])
    assert not _dir_may_match(all_null, [("s", "!=", "q")])


def _batched_table(spark, tmp_path):
    """Four commits with disjoint k-ranges; batch 3 carries NULL v rows
    so IS NULL pruning has something real to keep/prune."""
    t = VersionedTable(spark, str(tmp_path / "t13"))
    t.set_stats_columns(["k", "v"])
    for lo in range(0, 400, 100):
        rows = [
            Row(
                k=i,
                v=(None if (200 <= i < 300 and i % 10 == 0) else float(i)),
            )
            for i in range(lo, lo + 100)
        ]
        t.commit(spark.createDataFrame(rows, "k bigint, v double"), mode="append")
    return t


def test_read_where_disjunction_prunes_union_of_scopes(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    pred = "k BETWEEN 20 AND 40 OR k > 350"
    df, rep = t.read_where(pred)
    # union of scopes: batch 1 (k 0..99) and batch 4 (k 300..399) kept,
    # batches 2 and 3 provably miss BOTH disjuncts
    assert rep.total_dirs == 4 and rep.scanned_dirs == 2
    expect = sorted(
        r.k for r in t.read().filter(F.expr(pred)).collect()
    )
    assert sorted(r.k for r in df.collect()) == expect


def test_read_where_is_null_and_negation(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    df, rep = t.read_where("v IS NULL")
    # only batch 3 recorded any nulls
    assert rep.scanned_dirs == 1
    assert sorted(r.k for r in df.collect()) == list(range(200, 300, 10))
    df2, rep2 = t.read_where("NOT (k <= 99 OR k >= 200)")
    assert rep2.scanned_dirs == 1
    assert sorted(r.k for r in df2.collect()) == list(range(100, 200))


def test_read_where_string_matches_full_filter_always(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    full = t.read()
    for pred in [
        "k != 150",
        "v IS NOT NULL AND k BETWEEN 190 AND 210",
        "k IN (5, 250, 399) OR v IS NULL",
        "NOT k BETWEEN 0 AND 398",
    ]:
        df, _rep = t.read_where(pred)
        assert sorted(r.k for r in df.collect()) == sorted(
            r.k for r in full.filter(F.expr(pred)).collect()
        ), pred


def test_delete_where_disjunctive_string(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    base = t.versions()[-1]
    v = delete_where(t, "k < 20 OR v IS NULL")
    assert v == base + 1
    manifest = set(t._manifest(v))
    prev = set(t._manifest(base))
    # batches 2 (k 100..199) and 4 (k 300..399) provably miss both
    # disjuncts: carried by reference
    assert len(manifest & prev) == 2
    got = sorted(r.k for r in t.read().collect())
    expect = sorted(
        r.k
        for r in _batched_table(spark, tmp_path / "o").read().collect()
        if r.k >= 20 and not (200 <= r.k < 300 and r.k % 10 == 0)
    )
    assert got == expect


def test_update_where_disjunctive_string(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    update_where(t, {"v": "v + 1000.0"}, "k >= 390 OR k < 10")
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[5] == 1005.0 and rows[395] == 1395.0
    assert rows[50] == 50.0 and rows[250] is None


def test_update_where_unknown_rows_untouched(spark, tmp_path):
    t = _batched_table(spark, tmp_path)
    # v IS NULL rows evaluate UNKNOWN for v < 250 — SQL UPDATE leaves them
    update_where(t, {"v": "0.0"}, "NOT v >= 250.0")
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[100] == 0.0 and rows[300] == 300.0
    assert rows[250] is None
