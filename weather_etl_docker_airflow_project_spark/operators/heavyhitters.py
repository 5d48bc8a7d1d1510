"""Exact distributed heavy hitters (top-k most frequent keys) via
candidate-generation + recount — the two-pass shape that survives 100 TB
with a high-cardinality key where a naive ``GROUP BY key`` would shuffle
every distinct key.

Why not just ``groupBy(key).count().orderBy(...).limit(k)``? Spark's hash
aggregate already map-side combines, but the *shuffle* still carries one
row per distinct key per mapper. With billions of distinct keys (URLs,
session ids, n-grams) the shuffle write dominates. The classic fix
(Misra-Gries / Space-Saving, and the mergeable-summaries formulation of
Agarwal et al., PODS'12) is:

1. **Candidate pass** — each partition keeps a capacity-``C`` frequency
   summary (merge each Arrow batch's ``value_counts`` into a running
   pandas Series; when it exceeds ``C``, subtract the (C+1)-th largest
   count from everything and drop the non-positive — the batched
   Misra-Gries decrement). Any key with partition frequency
   ``> n_p / (C+1)`` provably survives; by pigeonhole any key with GLOBAL
   frequency ``> N / (C+1)`` exceeds that bound in at least one partition,
   so the union of per-partition survivors is a SUPERSET of every key with
   frequency above ``N/(C+1)``. Only ≤ C keys per partition are emitted —
   the shuffle is ``O(partitions × C)`` regardless of key cardinality.
2. **Recount pass** — broadcast the (small, deduped) candidate set back
   over the fact, semi-join, and take EXACT counts of candidates only,
   then top-k with a deterministic tie-break.

The result is exact (not approximate) whenever the k-th true frequency
exceeds ``N/(C+1)`` — the operator computes both sides of that bound and
raises if the guarantee cannot be certified, rather than silently
returning a plausible-but-unverified top-k.

Reference parity: the reference (airflow/dags/weather_etl.py) has no
frequency analytics; this is part of the brief's training-data-pipeline
surface (vocabulary building, hot-key detection before a salted join,
popular-document sampling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _candidate_gen(key: str, capacity: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            summary = summary.add(pdf[key].value_counts(), fill_value=0)
            if len(summary) > capacity:
                # batched Misra-Gries decrement: subtract the (C+1)-th
                # largest count from everything, keep strictly-positive
                # survivors (at most C keys can exceed the (C+1)-th value,
                # so the summary shrinks to ≤ C; the subtraction is what
                # the undercount-≤-n_p/(C+1) bound accounts)
                cut = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary - cut
                summary = summary[summary > 0]
        yield pd.DataFrame({key: summary.index})

    return gen


def heavy_hitters(df: DataFrame, key: str, k: int, capacity: int = 4096) -> DataFrame:
    """Exact top-``k`` keys of ``df[key]`` by frequency.

    Returns columns ``(key, n)`` with ``n`` the exact count, ordered is the
    caller's job (the returned frame is the unordered exact counts of the
    top-k set — callers order/limit so the sort shows up in THEIR plan).

    Raises ``ValueError`` when the Misra-Gries guarantee cannot certify
    exactness (k-th candidate count ≤ N/(capacity+1)): the caller must
    raise ``capacity`` — a silent approximate answer is worse than an
    error in a correctness-gated pipeline.
    """
    key_field = df.schema[key]
    cands = (
        df.select(key)
        .mapInPandas(_candidate_gen(key, capacity), schema=f"{key} {key_field.dataType.simpleString()}")
        .distinct()
    )
    counts = (
        df.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = counts.orderBy(F.col("n").desc(), F.col(key)).limit(k)
    # certify: k-th kept count must beat the MG survival threshold
    stats = df.agg(F.count(F.lit(1)).alias("total")).collect()[0]
    kept = topk.agg(F.min("n").alias("kth")).collect()[0]
    if stats["total"] == 0:
        return topk
    if kept["kth"] is None or kept["kth"] * (capacity + 1) <= stats["total"]:
        raise ValueError(
            f"heavy_hitters: cannot certify exactness — k-th count {kept['kth']} "
            f"<= N/(C+1) = {stats['total']}/{capacity + 1}; raise capacity"
        )
    return topk


def _cm_bucket(width: int):
    """The Count-Min bucket hash over the prepared ``(_k, row)`` columns.
    ONE definition shared by build and probe — the sketch's entire
    never-undercount contract depends on both hashing identically, and a
    drifted copy would silently return near-zero estimates through the
    probe's left-join coalesce."""
    return F.expr(
        "CAST(conv(substr(md5(concat(_k, '|', CAST(row AS STRING))), 1, 8), 16, 10) "
        f"AS BIGINT) % {width}"
    )


def countmin_sketch(
    df: DataFrame, key: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a Count-Min sketch (Cormode-Muthukrishnan) of the key column
    as a ``(row, bucket, c)`` table — ``depth`` hash rows × ``width``
    buckets, ``c`` = number of input rows hashing there.

    The sketch is THE mergeable bounded-memory frequency summary: the
    build is one exploded projection (``depth`` probe rows per input row,
    all map-side) plus one map-side-combinable groupBy whose output is at
    most ``depth × width`` rows no matter the input cardinality — partial
    sketches from any partitioning/stream merge by cell-wise addition,
    which is exactly what the partial-aggregate shuffle does. Estimates
    overestimate only: ``est(k) = min over rows of cell(row, h_row(k))``
    ≥ true count, with the classic (e/width, 1-(1/e)^depth) error bound.

    Hashes are md5-derived (``md5(key || '|' || row)`` first 8 hex digits
    mod width) — engine-portable, so a DuckDB oracle can restate the
    ENTIRE sketch and the estimates hash-exactly (the repo's determinism
    rule); no engine-private hash ever reaches declared output.
    """
    probes = df.select(
        F.col(key).cast("string").alias("_k"),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row"),
    )
    return (
        probes.select(
            F.col("row").cast("long").alias("row"),
            _cm_bucket(width).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query a Count-Min sketch for every row of ``keys``: returns
    ``keys`` plus ``n_est`` (the min over the sketch's depth rows —
    never below the true count). The sketch is ≤ depth × width rows, so
    it BROADCASTS — estimating any number of keys is a map join plus one
    per-key min, the fact table never reshuffles."""
    probes = keys.select(
        F.col(key),
        F.col(key).cast("string").alias("_k"),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row"),
    )
    joined = probes.select(
        F.col(key),
        F.col("row").cast("long").alias("row"),
        _cm_bucket(width).alias("bucket"),
    ).join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("n_est")
    )
