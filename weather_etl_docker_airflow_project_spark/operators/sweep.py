"""Distributed interval sweep: max concurrency over interval tables.

The classic "maximum number of simultaneously open sessions" statistic is
a sweep-line: emit (+1 at start, -1 at end), sort by time, running-sum,
take the max. The textbook SQL does it with ONE ordered window over all
events — which Spark executes per partition key on a single task, so a
low-cardinality key (or a global timeline) serializes the whole fact
table through one reducer. That is the non-scalable shape.

This operator uses the two-pass distributed prefix-sum instead (the same
decomposition parallel scan algorithms use):

1. Bucket every sweep point by a coarse time bucket (hour). Within each
   ``(key, bucket)`` the running sum and its max are computed by an
   ordered window — buckets are processed IN PARALLEL, and each holds
   only its own slice of points.
2. Per ``(key, bucket)``, keep two scalars: the bucket's net delta sum
   and the max local prefix. The bucket-level table is tiny (keys ×
   hours), so the cross-bucket prefix offset is one cheap ordered window
   over it; the true global max is ``max(offset_before_bucket +
   local_max)``.

The result is EXACT and identical to the one-window formulation (prefix
sums decompose associatively; tie order inside one instant only permutes
identical deltas, which cannot change the max — ends sort before starts
at the same timestamp via the ``(t, delta)`` order, making intervals
half-open). The only ordered structure touching full data volume is
bucket-local; the sequential part is bucket-count-sized. At 100 TB with
hot keys, shrink the bucket width — parallelism is (keys × buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def max_concurrency(
    intervals: DataFrame,
    key: str,
    start_col: str = "t_start",
    end_col: str = "t_end",
) -> DataFrame:
    """Per-key maximum number of simultaneously open intervals
    (half-open ``[start, end)``), via the bucketed two-pass prefix sum
    described in the module docstring.

    Returns ``(key, max_concurrent, n_intervals)``.
    """
    pts = intervals.select(
        F.col(key), F.col(start_col).alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            F.col(key), F.col(end_col).alias("t"), F.lit(-1).alias("delta")
        )
    )
    pts = pts.withColumn("bkt", F.date_trunc("hour", F.col("t")))
    # pass 1 (parallel across (key, bucket)): local running max + net sum
    wl = (
        Window.partitionBy(key, "bkt")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        pts.withColumn("run", F.sum("delta").over(wl))
        .groupBy(key, "bkt")
        .agg(
            F.max("run").alias("local_max"),
            F.sum("delta").alias("net"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
        )
    )
    # pass 2 (tiny, keys x buckets rows): offset = sum of earlier buckets
    wo = (
        Window.partitionBy(key)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = local.withColumn("off", F.coalesce(F.sum("net").over(wo), F.lit(0)))
    return offset.groupBy(key).agg(
        F.max(F.col("off") + F.col("local_max")).cast("long").alias("max_concurrent"),
        F.sum("n_starts").cast("long").alias("n_intervals"),
    )


def capped_running_sum(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    val_col: str,
    cap: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key running sum that FLUSHES at a cap: walking each key's rows
    in order, the accumulator adds the row's value; when it reaches
    ``cap`` the row is flagged ``flushed`` and the carry resets to zero
    (the batching/quota/micro-dose pattern: emit a batch every time the
    accumulated size crosses a threshold).

    Why not a window function: the fold is NON-associative — the carry
    after row n depends on every earlier reset decision, and a reset is
    a data-dependent branch, so no frame-based aggregate (or prefix-sum
    decomposition like :func:`max_concurrency`'s) can express it. This
    is the canonical ``applyInPandas`` shape instead: keys process in
    parallel (one shuffle on the key), the per-key scan is sequential
    but bounded by per-key cardinality — the same state-per-key contract
    as the streaming ``applyInPandasWithState`` twin (T8). The SQL twin
    needs a recursive CTE (the declared oracle states exactly that), so
    this operator is also the repo's §2.10 witness that the Pandas path
    and a recursive-SQL oracle can hash-match.

    Returns one row per input row: ``(key, id_col, acc_after, flushed)``
    — ``id_col`` (integer row identity, default ``event_id``) carries
    the per-row attribution; ``acc_after`` is the accumulator INCLUDING
    this row, before any reset it triggers.
    """
    import pandas as pd

    out_schema = f"{key} long, {id_col} long, acc_after long, flushed boolean"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        acc = 0
        accs, flushed = [], []
        for v in pdf[val_col]:
            acc += int(v)
            hit = acc >= cap
            accs.append(acc)
            flushed.append(hit)
            if hit:
                acc = 0
        return pd.DataFrame(
            {
                key: pdf[key].astype("int64"),
                id_col: pdf[id_col].astype("int64"),
                "acc_after": pd.Series(accs, dtype="int64"),
                "flushed": pd.Series(flushed, dtype="bool"),
            }
        )

    return df.groupBy(key).applyInPandas(fold, out_schema)
