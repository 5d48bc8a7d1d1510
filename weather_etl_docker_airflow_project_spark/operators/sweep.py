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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def two_pass_prefix(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    val_col,
    out_col: str,
    part_cols: tuple[str, ...] = (),
    total_col: str | None = None,
) -> DataFrame:
    """Generic two-pass distributed prefix sum — the reusable core of
    :func:`max_concurrency`, factored out so every global running
    total/rank in the repo can share the scalable shape instead of a
    single ordered window.

    Requires that ``(part_cols, bucket_col, order_cols)`` is the intended
    total order with ``bucket_col`` a coarse monotone prefix of it (high
    bits of a hash, a value-range bucket, a time bucket). Then:

    1. Bucket-local pass (parallel across ``part × bucket``): ordered
       running sum of ``val_col`` within each bucket, plus the bucket's
       net total via a separate aggregate.
    2. Offset pass over the TINY bucket table (``|part| × |buckets|``
       rows): ordered window summing earlier buckets' nets. This is the
       only sequential structure and it never touches full data volume.
    3. Broadcast-join offsets back; ``out_col = offset + local prefix``.

    The decomposition is exact (prefix sums are associative), so results
    are identical to ``sum(val) OVER (ORDER BY ...)`` row for row —
    oracle hashes certify that per use site. ``val_col`` may be a Column
    (e.g. ``F.lit(1)`` turns this into a distributed ``row_number``).
    All input columns pass through; ``out_col`` is appended. When
    ``total_col`` is given, the per-``part_cols`` grand total of
    ``val_col`` is appended too — computed on the tiny bucket-net table,
    so callers needing ``sum(val) OVER (PARTITION BY part)`` avoid a
    third full-data scan.
    """
    val = val_col if isinstance(val_col, Column) else F.col(val_col)
    wl = (
        Window.partitionBy(*part_cols, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = df.withColumn("_loc", F.sum(val).over(wl))
    nets = df.groupBy(*part_cols, bucket_col).agg(F.sum(val).alias("_net"))
    wo = (
        Window.partitionBy(*part_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    extra = (
        [F.sum("_net").over(Window.partitionBy(*part_cols)).alias(total_col)]
        if total_col
        else []
    )
    offs = nets.select(
        *part_cols,
        bucket_col,
        F.coalesce(F.sum("_net").over(wo), F.lit(0)).alias("_off"),
        *extra,
    )
    joined = loc.join(F.broadcast(offs), [*part_cols, bucket_col], "inner")
    return joined.withColumn(out_col, F.col("_off") + F.col("_loc")).drop(
        "_loc", "_off"
    )


def bucketed_row_number(
    df: DataFrame,
    bucket_col: str,
    order_cols: list[str],
    out_col: str = "pos",
    part_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed ``row_number() OVER (ORDER BY part, bucket, order)``:
    :func:`two_pass_prefix` with a unit weight. The full-data window is
    partitioned by ``(part, bucket)``; only the bucket-count-sized offset
    table goes through an unpartitioned window. Row identity inside one
    bucket must be totally ordered by ``order_cols`` (same contract as
    the window formulation it replaces)."""
    out = two_pass_prefix(
        df, bucket_col, order_cols, F.lit(1), out_col, part_cols=part_cols
    )
    return out.withColumn(out_col, F.col(out_col).cast("long"))


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    val_col: str,
    weight_col: str,
    tie_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Exact per-group weighted median that scales past low-cardinality
    group keys: the textbook formulation (cumulative weight over the
    value-sorted stream, first row where ``2·cum ≥ total``) runs its
    ordered window per GROUP, so a 3-value group key serializes a third
    of the fact table through one task. Here the cumulative weight comes
    from :func:`two_pass_prefix` instead, bucketed by value range:

    - per-group min/max (one tiny aggregate, broadcast) define
      ``n_buckets`` equal-width value buckets — bucket id is monotone in
      the value, so (group, bucket, value, ties) is the same total order;
    - bucket-local cumulative weights run parallel across
      ``group × bucket``; the offset window touches only the tiny
      bucket table;
    - the median pick is ``min(struct(cum, val))`` over the qualifying
      rows — an ordinary map-side-combinable aggregate, no ranking
      window at all.

    Weights must be positive (cum is then strictly increasing, so the
    pick is unique). Values/weights should be DECIMAL for exact,
    order-free sums. Bucketing computes in double purely for the bucket
    id: double conversion and division are monotone, and a skewed bucket
    only costs balance, never correctness. Returns
    ``(group_col, weighted_median)`` with the value kept in its input
    type (callers cast for declaration)."""
    rng = df.groupBy(group_col).agg(
        F.min(F.col(val_col)).cast("double").alias("_mn"),
        F.max(F.col(val_col)).cast("double").alias("_mx"),
    )
    bucketed = df.join(F.broadcast(rng), group_col, "inner").withColumn(
        "_bkt",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(val_col).cast("double") - F.col("_mn"))
                * n_buckets
                / F.greatest(F.col("_mx") - F.col("_mn"), F.lit(1e-9))
            ),
        ).cast("int"),
    )
    cum = two_pass_prefix(
        bucketed,
        "_bkt",
        [val_col, *tie_cols],
        weight_col,
        "_cum",
        part_cols=(group_col,),
        total_col="_tot",  # derived on the tiny nets table, no third scan
    )
    hits = cum.filter(2 * F.col("_cum") >= F.col("_tot"))
    return hits.groupBy(group_col).agg(
        F.min(F.struct("_cum", val_col)).getField(val_col).alias("weighted_median")
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
