"""Incremental materialized-rollup maintenance (SURVEY.md §2.12 ext).

The 100 TB pattern: a daily rollup over an append-only event stream must
never recompute from the base table. For ADDITIVE aggregates (count, sum,
and anything decomposable into them) the maintained table IS a partial
aggregate, so maintenance is: partial-aggregate the new batch, union with
the existing rollup, re-aggregate (sum of sums, sum of counts), rewrite.
Cost ∝ |rollup| + |batch| — the base events are never touched again.

Non-additive aggregates (min/max survive unions too; exact distinct does
not) are handled by the SKETCH variant below: the maintained column is a
mergeable HLL sketch (Apache DataSketches via ``hll_sketch_agg``), whose
union is deterministic register-wise max — so incremental maintenance
produces the BIT-IDENTICAL sketch (and therefore estimate) a one-shot
aggregation would, proven in tests. The affected-key exact recompute
remains the alternative when the ±~2% HLL error is unacceptable.

The declared queries (``a16_incremental_rollup``,
``a17_sketch_rollup``) replay the events table in five batches through
these paths; a16 must hash-match a one-shot GROUP BY oracle, a17's gates
are pytest (incremental == one-shot sketch exactly; estimate within 5%
of exact distinct) since sketch bytes are engine-specific.
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


def _contrib(batch: DataFrame) -> DataFrame:
    """Per-row rollup contributions of a raw batch — the UNAGGREGATED
    twin of :func:`_partial` (n_events=1, sum_vfloor=floor(value) per
    row). Merging unions these directly with the existing rollup so the
    whole maintenance step is ONE exchange: Spark's hash aggregate
    already performs map-side partial aggregation of the union, making
    an explicit pre-aggregation of the batch a second, redundant
    shuffle (r15 — one exchange removed per maintenance cycle, measured
    ~0.3s/cycle at sf0.1; identical sums by associativity)."""
    return batch.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.lit(1).cast("long").alias("n_events"),
        F.floor("value").cast("long").alias("sum_vfloor"),
    )


def merge_rollup(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """One maintenance step: existing rollup ⊎ batch contributions,
    merged by summing the additive partials per (user_id, day) — a
    single exchange (see :func:`_contrib`)."""
    return (
        existing.unionByName(_contrib(batch))
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
    # dynamic partition overwrite commits into partition dirs and writes
    # NO root _SUCCESS marker — existence = any day= partition present
    # (an _SUCCESS check here silently reset the rollup every batch)
    has_rollup = os.path.isdir(sink_dir) and any(
        e.startswith("day=") for e in os.listdir(sink_dir)
    )
    if has_rollup:
        existing = spark.read.schema(ROLLUP_SCHEMA).parquet(sink_dir)
        # touched days from the RAW batch (one small distinct agg): the
        # old partial-based derivation made the broadcast build re-run
        # the full (user_id, day) aggregation a second time per cycle
        affected_days = (
            batch.select(F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct()
        )
        touched = existing.join(F.broadcast(affected_days), "day", "left_semi")
        # materialize BEFORE the overwrite: the merge READS the very
        # partitions the write replaces — without the checkpoint the
        # lazy self-read races the overwrite and loses rows
        updated = merge_rollup(touched, batch).localCheckpoint()
    else:
        updated = _partial(batch)
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


# ---------------------------------------------------------------------------
# Sketch rollup: the non-additive metric (distinct users/day) maintained
# incrementally via a mergeable HLL sketch column.

SKETCH_ROLLUP_SCHEMA = "day timestamp, n_events long, users_hll binary"
HLL_LGK = 12  # 2^12 registers -> ~1.6% relative standard error


def _sketch_partial(batch: DataFrame) -> DataFrame:
    return batch.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.hll_sketch_agg(F.col("user_id"), F.lit(HLL_LGK)).alias("users_hll"),
    )


def merge_sketch_rollup(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """One maintenance step for the sketch rollup: HLL union is
    register-wise max — associative, commutative, idempotent — so the
    merged sketch equals the one-shot sketch over all rows seen.

    Single-exchange shape (r15, the additive rollup's _contrib argument
    applied to sketches): RAW batch rows union with the existing rollup
    rows and ONE day-keyed aggregate both sketches the new user_ids
    (``hll_sketch_agg``) and unions the carried sketches
    (``hll_union_agg`` — aggregates skip NULLs, so each side ignores the
    other's padding columns); the two per-day sketches fold with the
    binary ``hll_union``. The old shape pre-aggregated the batch first —
    a second, redundant exchange. Register-exact either way (union is
    max, order-free; pytest gates incremental == one-shot bit-exactly)."""
    ex = existing.select(
        "day",
        F.col("n_events"),
        F.col("users_hll"),
        F.lit(None).cast("long").alias("user_id"),
    )
    raw = batch.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.lit(1).cast("long").alias("n_events"),
        F.lit(None).cast("binary").alias("users_hll"),
        F.col("user_id"),
    )
    merged = (
        ex.unionByName(raw)
        .groupBy("day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            # strict lgK match: every sketch in this rollup is built with
            # HLL_LGK, so a config drift should fail loudly, not degrade
            F.hll_union_agg(F.col("users_hll"), F.lit(False)).alias("_hll_old"),
            F.hll_sketch_agg(F.col("user_id"), F.lit(HLL_LGK)).alias("_hll_new"),
        )
    )
    return merged.select(
        "day",
        "n_events",
        F.when(F.col("_hll_old").isNull(), F.col("_hll_new"))
        .when(F.col("_hll_new").isNull(), F.col("_hll_old"))
        .otherwise(
            F.expr("hll_union(_hll_old, _hll_new)")
        )
        .alias("users_hll"),
    )


def maintain_sketch_rollup(
    spark: SparkSession, sink_dir: str, batch: DataFrame
) -> DataFrame:
    """Apply one batch to the day-partitioned SKETCH rollup at
    ``sink_dir`` — identical partition-pruned dynamic-overwrite shape as
    :func:`maintain_rollup` (only touched days are read and rewritten;
    cost ∝ |rollup days touched| + |batch|), but the maintained
    distinct-users column is an HLL sketch, the thing the additive path
    cannot carry. Estimate with ``hll_sketch_estimate(users_hll)``."""
    has_rollup = os.path.isdir(sink_dir) and any(
        e.startswith("day=") for e in os.listdir(sink_dir)
    )
    if has_rollup:
        existing = spark.read.schema(SKETCH_ROLLUP_SCHEMA).parquet(sink_dir)
        # touched days from the RAW batch — see maintain_rollup (the
        # partial-based derivation re-ran the sketch aggregation inside
        # the broadcast build)
        affected_days = (
            batch.select(F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct()
        )
        touched = existing.join(F.broadcast(affected_days), "day", "left_semi")
        updated = merge_sketch_rollup(touched, batch).localCheckpoint()
    else:
        updated = _sketch_partial(batch)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            updated.select("n_events", "users_hll", "day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(sink_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.read.schema(SKETCH_ROLLUP_SCHEMA).parquet(sink_dir).select(
        "day", "n_events", "users_hll"
    )
