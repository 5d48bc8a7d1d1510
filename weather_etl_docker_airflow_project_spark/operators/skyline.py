"""Distributed 2-D skyline (Pareto frontier): the rows not dominated in
(minimize time, maximize value) — e.g. "orders that were the
highest-value seen up to their date", price/performance frontiers,
best-so-far leaderboards.

The textbook formulation is one global window (prefix-max over the full
sort order) — a single-partition sort that serializes the whole table
through one task, which is exactly the plan you must NOT ship at 100 TB.
This operator computes the identical answer with a two-level prefix scan:

1. **Bucket level** — rows bucket by a coarse, deterministic, ORDERED key
   (calendar month of the time column). Per-bucket maxima form a
   dimension-sized table (#months), whose strict-predecessor running max
   is computed with a window over that TINY table (single partition over
   ~hundreds of rows — a dimension op, not a fact op).
2. **Row level** — the per-bucket prefix maxima broadcast-join back onto
   the fact; within each bucket a window PARTITIONED BY bucket computes
   the strictly-earlier running max in parallel. A row's global
   "best strictly before me" is then greatest(bucket_prefix,
   within_bucket_prefix), and dominance falls out per-row.

So the fact is touched by: one shuffle to bucket-partition the window,
one broadcast join — no global sort, no single-partition stage on fact
data. Same recurrence as a distributed prefix-sum (scan) — Blelloch's
two-phase scan shape expressed in DataFrame ops.

Dominance rule (strict Pareto): row r is dominated iff some s has
(s.t <= r.t AND s.v >= r.v) with at least one strict. Split by time:
- s.t < r.t, s.v >= r.v  ->  max_before >= v   (max over strictly earlier)
- s.t = r.t, s.v >  r.v  ->  max_same > v      (max within same instant)
Both maxima are selections (no float arithmetic), so the declared output
is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    time_col: str,
    value_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (min ``time_col``, max ``value_col``) Pareto
    frontier. ``bucket`` must be a deterministic coarsening of the time
    column that preserves its order (default: calendar month); bucket
    cardinality should be dimension-sized (each distinct bucket value
    becomes one row of the level-1 table)."""
    b = bucket if bucket is not None else F.date_trunc("month", F.col(time_col))
    tu = F.unix_micros(F.col(time_col).cast("timestamp"))
    d = df.withColumn("_b", b).withColumn("_tu", tu)

    bmax = d.groupBy("_b").agg(F.max(value_col).alias("_bm"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bprefix = bmax.select(
        "_b", F.max("_bm").over(wb).alias("_before_bucket")
    )

    wd = (
        Window.partitionBy("_b")
        .orderBy("_tu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    ws = Window.partitionBy("_b", "_tu")
    v = F.col(value_col)
    enriched = (
        d.join(F.broadcast(bprefix), "_b")
        .withColumn("_before_in_bucket", F.max(value_col).over(wd))
        .withColumn("_same_t", F.max(value_col).over(ws))
    )
    # greatest() skips NULLs in Spark: first bucket / first row stay NULL
    before = F.greatest(F.col("_before_bucket"), F.col("_before_in_bucket"))
    keep = (before.isNull() | (before < v)) & (F.col("_same_t") <= v)
    return enriched.filter(keep).drop(
        "_b", "_tu", "_before_bucket", "_before_in_bucket", "_same_t"
    )
