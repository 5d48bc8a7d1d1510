"""Skew mitigation: salted join and two-phase aggregation.

AQE's skew-join splitting (on in ``session.build_session``) handles most
runtime skew; these helpers cover the cases AQE cannot re-plan —
broadcast-ineligible joins against a hot key, and aggregations whose hot
group overwhelms one reducer BEFORE adaptive statistics exist (first
shuffle of a stage). Both are standard public patterns: replicate the
small side per salt bucket, or aggregate in two phases (partial per
(key, salt), final per key).

The salt must be deterministic for the driver's hash gate, so it derives
from xxhash64 of the row's own columns (never rand()) — xxhash64 stays
INTERNAL (pre-aggregation), which keeps the no-engine-hash-in-output rule.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, cols: list[str], n: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Add a deterministic salt column in [0, n) from the given columns
    (use high-cardinality payload columns, not the skewed key itself)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n)))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_cols: list[str],
    n: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has skewed keys: left rows scatter across n
    salt buckets (by hashing ``salt_cols``), the right side replicates n
    times, and the join key becomes (keys..., salt) — the hot key's rows
    now land on n reducers instead of one. Right-side cost: n-fold
    replication, so use for small-to-medium right sides only (a huge right
    side wants AQE skew-join instead).

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported: the
    n-fold right replication emits every UNMATCHED right row n times under
    ``right``/``full``/``cross``, silently corrupting those semantics."""
    if how not in (
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    ):
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics: the right side "
            "is replicated per salt bucket, so unmatched right rows would be "
            "emitted once per bucket — use AQE skew-join for right/full joins"
        )
    l = with_salt(left, salt_cols, n)
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    return l.join(r, [*keys, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    n: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates per
    (keys, salt) — the hot group splits across n reducers — phase 2 merges
    partials per key. ``partial_aggs`` name their outputs; ``final_aggs``
    builds the merge expressions over those names (e.g. partial
    ``sum(x) AS s, count(*) AS c`` -> final ``sum(s) AS s, sum(c) AS c``)."""
    partial = with_salt(df, salt_cols, n).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs())
