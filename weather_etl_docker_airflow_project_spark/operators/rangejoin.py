"""Bucketed range join (SURVEY.md §2.3 J7, the big-x-big path).

A range/interval join with a SMALL interval side is best served broadcast
(see ``plans/relational.j7_range_value_buckets``). When BOTH sides are
large, Spark's only native plan is a broadcast-nested-loop or cartesian
theta join — O(n*m). The standard scalable rewrite decomposes intervals
into fixed-width buckets:

1. each point maps to exactly one bucket: floor(x / width);
2. each interval [lo, hi) explodes to every bucket it overlaps;
3. equi-join on bucket (a normal hash-shuffle join);
4. refine with the exact containment predicate.

A (point, interval) pair meets in exactly one bucket — the point's — so
no dedup is needed. Cost: |intervals| * (span/width) replication vs the
n*m blowup; width tunes replication against bucket selectivity (rule of
thumb: width ~ median interval length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` via fixed-width bucket decomposition — one
    hash-shuffle equi-join instead of a nested-loop theta join."""
    p = points.withColumn(_BUCKET, F.floor(F.col(point_col) / bucket_width))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    refined: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    return p.join(i, [_BUCKET], how).filter(refined).drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join (half-open ``[start, end)`` both
    sides, overlap iff ``l_start < r_end AND r_start < l_end``), the
    big-x-big generalization of :func:`bucketed_interval_join`: each side
    replicates to every fixed-width bucket its span touches, the join is
    a plain hash-shuffle equi-join on ``(on..., bucket)``, and the exact
    predicate refines.

    Unlike the point-in-interval case, an overlapping PAIR can meet in
    several buckets, so each pair is claimed exactly once: in the bucket
    of ``greatest(l_start, r_start)`` — which overlap guarantees lies
    inside both spans (``max(start) < min(end)``), so both replicas exist
    there. No post-join dedup shuffle.

    Start/end columns are numeric (epoch micros, seconds — caller picks);
    ``bucket_width`` tunes replication (rows replicate ``span/width + 1``
    times) against bucket selectivity — rule of thumb: width ~ median
    interval length. All four interval column names must be distinct.
    """
    names = {l_start, l_end, r_start, r_end}
    if len(names) != 4:
        raise ValueError("interval column names must be distinct across sides")

    def spread(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width),
                    F.floor(F.col(e) / bucket_width),
                )
            ),
        )

    overlap: Column = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    claimed: Column = F.col(_BUCKET) == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / bucket_width
    )
    return (
        spread(left, l_start, l_end)
        .join(spread(right, r_start, r_end), [*on, _BUCKET])
        .filter(overlap & claimed)
        .drop(_BUCKET)
    )
