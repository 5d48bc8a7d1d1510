"""Incremental materialized-rollup maintenance (SURVEY.md §2.12 ext).

The 100 TB pattern: a daily rollup over an append-only event stream must
never recompute from the base table. For ADDITIVE aggregates (count, sum,
and anything decomposable into them) the maintained table IS a partial
aggregate, so maintenance is: partial-aggregate the new batch, union with
the existing rollup, re-aggregate (sum of sums, sum of counts), rewrite.
Cost ∝ |rollup| + |batch| — the base events are never touched again.

Non-additive aggregates (min/max survive unions too; exact distinct does
not) need either a mergeable sketch (HLL — see a4) or the affected-key
recompute variant; both are documented trade-offs, not silent fallbacks.

The declared query (``a16_incremental_rollup``) replays the events table
in five batches through this path and must hash-match a one-shot GROUP BY
oracle — merge associativity is the thing being proven.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_SCHEMA = "user_id long, day timestamp, n_events long, sum_vfloor long"


def _partial(batch: DataFrame) -> DataFrame:
    return (
        batch.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor("value")).cast("long").alias("sum_vfloor"),
        )
    )


def merge_rollup(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """One maintenance step: existing rollup ⊎ partial(batch), merged by
    summing the additive partials per (user_id, day)."""
    return (
        existing.unionByName(_partial(batch))
        .groupBy("user_id", "day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_vfloor").cast("long").alias("sum_vfloor"),
        )
    )


def maintain_rollup(
    spark: SparkSession, sink_dir: str, batch: DataFrame
) -> DataFrame:
    """Apply one batch to the day-partitioned rollup at ``sink_dir``
    (creating it if absent) and return the updated rollup.

    The maintenance touches ONLY the day partitions present in the batch:
    the existing rollup is read semi-joined to the batch's days (partition
    pruning confines the read), merged with the batch partials, and
    written back with dynamic partition overwrite — untouched days are
    never read or rewritten, so a daily-cadence batch costs one partition
    regardless of rollup history length. A failed job leaves prior
    partitions intact (output commits at job completion); a lakehouse
    MERGE/commit log is the production upgrade (NOTES.md)."""
    partial = _partial(batch)
    # dynamic partition overwrite commits into partition dirs and writes
    # NO root _SUCCESS marker — existence = any day= partition present
    # (an _SUCCESS check here silently reset the rollup every batch)
    has_rollup = os.path.isdir(sink_dir) and any(
        e.startswith("day=") for e in os.listdir(sink_dir)
    )
    if has_rollup:
        existing = spark.read.schema(ROLLUP_SCHEMA).parquet(sink_dir)
        affected_days = partial.select("day").distinct()
        touched = existing.join(F.broadcast(affected_days), "day", "left_semi")
        # materialize BEFORE the overwrite: the merge READS the very
        # partitions the write replaces — without the checkpoint the
        # lazy self-read races the overwrite and loses rows
        updated = merge_rollup(touched, batch).localCheckpoint()
    else:
        updated = partial
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            updated.select("user_id", "n_events", "sum_vfloor", "day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(sink_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.read.schema(ROLLUP_SCHEMA).parquet(sink_dir).select(
        "user_id", "day", "n_events", "sum_vfloor"
    )
