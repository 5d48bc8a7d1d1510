"""Smoke test mirroring the driver's t1 check: entry() runs on sf0.001 and
returns rows with a stable schema."""

from __future__ import annotations

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_custkey", "c_name", "revenue", "n_items"]


def test_contract_shape(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 1
    assert set(oracles).issubset(set(qs))
