"""Query registry backing the driver contract.

Each QuerySpec pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for ops that are
not SQL-expressible, e.g. hash-seeded LSH candidates — those get the
driver's weaker rows-only check).

Determinism rules every registered query follows (SURVEY.md §7 "hard/risky"):
- alias every computed column identically in Spark and SQL;
- money-column sums/avgs go through exact DECIMAL(18,2) arithmetic in BOTH
  engines, then cast to double (bit-identical, no float summation-order
  drift);
- ordering ties are always broken by a unique key;
- no wall-clock, no engine-specific hash (xxhash64) in hashed outputs —
  md5/sha2 only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
