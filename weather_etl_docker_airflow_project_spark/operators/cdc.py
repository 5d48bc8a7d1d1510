"""Snapshot differencing (CDC without a log): given two full snapshots of
the same keyed table, emit the insert/update/delete delta.

This is the batch-CDC primitive every lakehouse ingestion pipeline needs
when the upstream can only hand over full dumps: diff yesterday's snapshot
against today's, then feed the delta into an upsert/SCD2 sink
(operators/upsert.py / operators/scd2.py). The reference's ETL appends
every observation (airflow/dags/weather_etl.py:144-149) and has no delta
extraction; this is part of the brief's pipeline surface.

Scale shape (the part that matters at 100 TB):

- ONE full-outer shuffle join on the key — and if both snapshots are
  written bucketed on the key (plans/io_q.py S12 shows the zero-Exchange
  bucketed join), the diff runs with NO shuffle at all, which is how you
  diff two 50 TB snapshots nightly.
- Change detection compares a single md5 fingerprint of the tracked
  columns, built JVM-side inside whole-stage codegen — the wide payload
  never needs to be carried past the project that computes the hash, and
  adding tracked columns doesn't add join width.
- Column pruning: only key + fingerprint + the columns the caller wants
  surfaced survive the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(cols: list[str]):
    # concat_ws skips NULLs, which would make ('a', NULL) collide with
    # ('a',) — encode NULL explicitly so the fingerprint is injective on
    # the tracked tuple (same encoding on the oracle side).
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(" null")) for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Delta between two snapshots keyed by ``keys``.

    Returns one row per changed key: ``keys... , change_type
    ('insert'|'update'|'delete')`` — unchanged keys are filtered out
    before the caller ever sees them. Callers wanting old/new values
    re-join the delta to the snapshots (keeps this operator's output
    narrow; the delta is usually ≪ the snapshots).
    """
    o = old.select(
        *keys, _fingerprint(compare_cols).alias("_fp_old"), F.lit(1).alias("_in_old")
    )
    n = new.select(
        *keys, _fingerprint(compare_cols).alias("_fp_new"), F.lit(1).alias("_in_new")
    )
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a keyed change feed (op ∈ {'U', 'D'}: upsert / delete) to a
    snapshot — the INVERSE of snapshot_diff, and together with it the full
    batch-CDC cycle: diff produces a changelog, apply replays it. Rows of
    the base whose key appears in the changelog are dropped (one anti
    join), then the changelog's upserts (payload columns minus the op
    marker) are unioned in. Exactly-one-change-per-key is the caller's
    contract (enforce upstream with a last-wins window if the feed can
    carry multiples).

    Scale shape: one key-partitioned anti join + a union — with the base
    bucketed on the key, zero wide shuffle; cost ∝ |base| scan +
    |changes|, and the union never materializes the base twice.

    Op validation: any op outside {'U','D'} — including NULL, which
    three-valued logic would otherwise slide past an isin() test —
    RAISES before a single base row is touched. Without this gate an
    unexpected op (say 'I' from a Debezium-style feed) would be
    anti-joined out of the base and then silently dropped — data loss
    with no error. The changelog is localCheckpointed first so its
    upstream lineage runs ONCE (the gate scan and the two downstream
    reads all hit the materialized delta — delta-sized by contract,
    never base-sized)."""
    changes = changes.localCheckpoint()
    bad = (
        changes.select(op_col)
        .filter(
            ~F.col(op_col).isin("U", "D") | F.col(op_col).isNull()
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"apply_changelog: unexpected op {bad[0][0]!r} in changelog "
            f"(expected 'U' or 'D'); map or quarantine upstream ops before "
            f"applying — unknown ops would silently delete their keys"
        )
    ch_keys = changes.select(*keys).distinct()
    survivors = base.join(ch_keys, keys, "left_anti")
    upserts = changes.filter(F.col(op_col) == "U").drop(op_col)
    return survivors.unionByName(upserts)
