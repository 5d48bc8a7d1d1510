"""Differential oracle tests — the primary correctness gate (SURVEY.md §5.1).

Replicates the driver's check locally, but STRICTER: exact value equality
(the driver uses an order-insensitive value hash; exact match implies hash
match). Every registered query with an oracle runs on sf0.01 through both
Spark and DuckDB; row sets must be identical.
"""

from __future__ import annotations

import math

import pytest

from weather_etl_docker_airflow_project_spark.plans.catalog import REGISTRY

from conftest import SF_ORACLE

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style robustness: collapse -0.0 vs 0.0
        return v + 0.0
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def _rowset(rows):
    return sorted(
        (tuple(_normalize(v) for v in row) for row in rows),
        key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r),
    )


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spark, duck, spec):
    sdf = spec.fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert spark_cols == duck_cols, f"{spec.name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{spec.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_sorted, d_sorted = _rowset(spark_rows), _rowset(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{spec.name}: first mismatches {mismatches[:5]}"
    assert len(spark_rows) > 0, f"{spec.name}: empty result — query is trivially passing"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    sdf = spec.fn(spark, SF_ORACLE)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0
