"""SCD2 (slowly-changing-dimension, type 2) without storage-level MERGE.

The MERGE-less emulation (anti-join + union + comparison) of the classic
versioned-dimension update: a change whose tracked attributes differ from
the key's current version closes that version (valid_to = change ts,
is_current = false) and opens a new one; no-op changes are ignored;
history rows pass through untouched. With Delta/Iceberg available this
collapses to one MERGE INTO — the call shape here is the same, so
swapping the implementation is local to this module.

Scale notes: one shuffle on the key for the change-vs-current join; the
union sides are disjoint row sets of the same schema (no dedup needed).
Change streams should be pre-deduplicated to one change per key per batch
(use the latest; ``latest_change_per_key`` does this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(changes: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Keep only each key's latest change in the batch (ties broken by the
    tracked column values via the window's deterministic ordering)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    flag_col: str = "is_current",
) -> DataFrame:
    """Apply one batch of changes to an SCD2 dimension table.

    ``current``: key + tracked + start/end/flag columns (history included).
    ``changes``: key + tracked + ts_col, at most one row per key.
    Returns the updated dimension (history + closed + untouched + new)."""
    cur_cols = current.columns
    live = current.filter(F.col(flag_col))
    history = current.filter(~F.col(flag_col))

    diff = None
    for c in tracked:
        ne = ~F.col(f"ch.{c}").eqNullSafe(F.col(f"cur.{c}"))
        diff = ne if diff is None else (diff | ne)

    joined = live.alias("cur").join(
        changes.alias("ch"), F.col(f"cur.{key}") == F.col(f"ch.{key}"), "inner"
    )
    real = joined.filter(diff)

    closed = real.select(
        *[F.col(f"cur.{c}").alias(c) for c in cur_cols if c not in (end_col, flag_col)],
        F.col(f"ch.{ts_col}").alias(end_col),
        F.lit(False).alias(flag_col),
    ).select(*cur_cols)
    opened = real.select(
        F.col(f"ch.{key}").alias(key),
        *[F.col(f"ch.{c}").alias(c) for c in tracked],
        F.col(f"ch.{ts_col}").alias(start_col),
        F.lit(None).cast(current.schema[end_col].dataType).alias(end_col),
        F.lit(True).alias(flag_col),
    ).select(*cur_cols)
    untouched = live.join(
        real.select(F.col(f"cur.{key}").alias(key)), key, "left_anti"
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(opened)
