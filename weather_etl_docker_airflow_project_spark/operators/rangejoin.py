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
