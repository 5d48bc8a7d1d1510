"""As-of join (SURVEY.md §2.3 J8): for each left row, the nearest prior
right row with the same key.

Spark has no built-in as-of join; the scalable formulation is the
union + windowed ``last(..., ignorenulls=True)`` trick:

1. union left and right into one frame, tagging provenance;
2. one shuffle: partition by the ``by`` key, sort by (ts, tag) within each
   partition — right rows sort before left rows at equal timestamps so
   exact matches are visible;
3. ``last(right_payload, ignorenulls=True)`` over an unbounded-preceding
   running window carries the most recent right row forward;
4. keep only left rows.

Cost: exactly ONE shuffle of |left| + |right| rows on ``by`` — the same
lower bound as a sort-merge join — and no row explosion (a naive range
join ``l.ts >= r.ts`` explodes to O(n·m) before aggregation). Skewed
``by`` keys are handled by AQE skew-split since this is a window, not a
join. This is the standard large-scale formulation (same shape as
pandas.merge_asof semantics, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_payload: list[str],
    allow_exact_matches: bool = True,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: attach the latest right row with ``right.on <=
    left.on`` (``<`` if not allow_exact_matches) per ``by`` group.

    Returns all left columns plus ``<col><suffix>`` for each name in
    ``right_payload``. Left rows with no prior right row get nulls.
    """
    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns

    # Right rows sort before left rows at equal ts iff exact matches count.
    left_tag, right_tag = (1, 0) if allow_exact_matches else (0, 1)

    payload = [f"__r_{c}" for c in right_payload]
    l_side = left.select(
        *left_cols,
        F.lit(left_tag).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_payload, payload)],
    )
    r_side = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in by + [on] else F.col(c) for c in left_cols],
        F.lit(right_tag).alias(_TAG),
        *[F.col(c).alias(p) for c, p in zip(right_payload, payload)],
    )

    w = (
        Window.partitionBy(*by)
        # payload columns as final sort keys: two right rows at the same
        # (by, ts) would otherwise carry whichever sorted last — fine for
        # unique event streams, nondeterministic (and oracle-hash-breaking)
        # for duplicated ones
        .orderBy(F.col(on).asc(), F.col(_TAG).asc(), *[F.col(p).asc_nulls_first() for p in payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).select(
        "*", *[F.last(p, ignorenulls=True).over(w).alias(p + "__c") for p in payload]
    )
    is_left = F.col(_TAG) == F.lit(left_tag)
    if not allow_exact_matches:
        # tags flipped: left rows sort first at equal ts, so a right row at
        # the exact same ts is never carried into the left row. Provenance
        # check must still distinguish genuine left rows.
        is_left = F.col(_TAG) == F.lit(0)
    return (
        carried.filter(is_left)
        .select(
            *left_cols,
            *[F.col(p + "__c").alias(c + suffix) for c, p in zip(right_payload, payload)],
        )
    )
