"""Top-k operators (SURVEY.md §2.6 O3).

Global top-k: ``df.orderBy(...).limit(k)`` already compiles to
``TakeOrderedAndProject`` — per-partition top-k before a single-partition
merge, no full sort, no full shuffle. Nothing to add (SURVEY.md §4 item 5).

Grouped top-k: window ``row_number`` + filter. One shuffle on the group
key; the sort is per-partition. At 100 TB with heavy groups, AQE skew
handling applies; for tiny k and huge groups a two-phase (partial top-k per
map partition, then final) would cut sort cost, but Spark's window already
avoids materializing the full sorted output past the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_top_k(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group, deterministically ordered (callers must make
    ``order_by`` a total order, e.g. by appending a unique key)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    # rank as long: SQL engines (and the DuckDB oracle) type row_number()
    # as 64-bit, Spark as 32-bit — align so declared outputs hash identically
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )
