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
    """Apply one batch to the rollup persisted at ``sink_dir`` (creating
    it if absent) and return the updated rollup. The write goes through a
    temp directory + rename so a failed job never truncates the previous
    rollup state (the poor-man's transactional swap; a lakehouse format's
    MERGE/commit log is the production upgrade, NOTES.md)."""
    if os.path.exists(os.path.join(sink_dir, "_SUCCESS")):
        existing = spark.read.schema(ROLLUP_SCHEMA).parquet(sink_dir)
        updated = merge_rollup(existing, batch)
    else:
        updated = _partial(batch)
    tmp = sink_dir.rstrip("/") + "_tmp"
    updated.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(sink_dir)
    return spark.read.schema(ROLLUP_SCHEMA).parquet(sink_dir)
