"""Declarative data-quality checks (SURVEY.md §2.12 ext — the Deequ-shaped
validation pass every production table runs before promotion).

Rules compile to ONE aggregate pass over the table — a completeness rule
is ``sum(is_null)``, a range rule is ``sum(out_of_range)``, a uniqueness
rule is ``count - count_distinct`` — so a 100 TB validation costs one scan
+ one tiny shuffle regardless of how many rules are declared. The output
is one row per rule with its violation count: exact integers, so the
declared query is oracle-checkable (no float "quality scores").

Reference parity: the reference's only validation is the fail-fast config
guard (reference airflow/dags/weather_etl.py:98-99); this generalizes it
to data-plane invariants per the brief's pipeline mandate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One named invariant: ``violations`` must be an aggregate expression
    counting offending rows (or offending groups for uniqueness)."""

    name: str
    violations: Column


def not_null(col: str) -> Rule:
    return Rule(
        f"not_null_{col}",
        F.sum(F.col(col).isNull().cast("long")),
    )


def in_range(col: str, lo, hi) -> Rule:
    # NULL policy: a NULL value VIOLATES a range rule. The raw predicate
    # evaluates to NULL for NULL input and sum() would silently skip it,
    # under-reporting violations; coalesce pins NULL -> 1 so the operator
    # agrees with its declared oracle (CASE WHEN pred THEN 0 ELSE 1).
    return Rule(
        f"range_{col}",
        F.sum(
            F.coalesce(
                (~F.col(col).between(F.lit(lo), F.lit(hi))).cast("long"),
                F.lit(1),
            )
        ),
    )


def accepted_values(col: str, values: list) -> Rule:
    # NULL policy: NULL is never an accepted value (see in_range note).
    return Rule(
        f"accepted_{col}",
        F.sum(F.coalesce((~F.col(col).isin(values)).cast("long"), F.lit(1))),
    )


def unique(col: str) -> Rule:
    return Rule(
        f"unique_{col}",
        (F.count(F.col(col)) - F.countDistinct(F.col(col))).cast("long"),
    )


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregation; returns
    (rule, violations, passed) per rule, ordered by rule name."""
    if not rules:
        raise ValueError("run_checks needs at least one rule")
    agg = df.agg(
        *[F.coalesce(r.violations, F.lit(0)).cast("long").alias(r.name) for r in rules]
    )
    stacked = agg.selectExpr(
        "stack({n}, {pairs}) as (rule, violations)".format(
            n=len(rules),
            pairs=", ".join(f"'{r.name}', {r.name}" for r in rules),
        )
    )
    return stacked.select(
        "rule", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("rule")


def referential_integrity(
    checks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit: for each
    ``(name, child_df, fk_col, parent_df, pk_col)`` count the child rows
    whose foreign key has no match in the parent (NULL fks count as
    orphans — a NULL reference cannot resolve). Returns one row per
    constraint: ``(rule, fk_rows, orphans, passed)``, ordered by rule.

    Scale shape: each check is ONE left join of the fact's fk column
    against the parent's DISTINCT keys, aggregating total and orphan
    counts in the same pass (one fact scan per rule, not two) — the
    parent side is a dimension in every real star schema, so Catalyst
    broadcasts it and the fact never shuffles; counts are map-side
    combinable. The whole audit is a union of independent checks, so
    Spark runs them as parallel jobs of one action. Complements
    :func:`run_checks` (same (rule, violations, passed) discipline) for
    the invariants that span tables."""
    if not checks:
        raise ValueError("referential_integrity needs at least one check")
    parts = []
    for name, child, fk, parent, pk in checks:
        keys = parent.select(F.col(pk).alias(fk)).distinct().withColumn(
            "_matched", F.lit(1)
        )
        parts.append(
            child.select(F.col(fk))
            .join(keys, [fk], "left")
            .agg(
                F.lit(name).alias("rule"),
                F.count(F.lit(1)).cast("long").alias("fk_rows"),
                F.sum(F.when(F.col("_matched").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "fk_rows", "orphans", (F.col("orphans") == 0).alias("passed")
    ).orderBy("rule")


_EMPTY_SNAPSHOT_ERR = (
    "'distribution_drift: empty before/after snapshot — "
    "masses would divide by a zero total'"
)
_GUARDED_TB = (
    f"(CASE WHEN _tb > 0 AND _ta > 0 THEN _tb "
    f"ELSE raise_error({_EMPTY_SNAPSHOT_ERR}) END)"
)
_GUARDED_TA = (
    f"(CASE WHEN _tb > 0 AND _ta > 0 THEN _ta "
    f"ELSE raise_error({_EMPTY_SNAPSHOT_ERR}) END)"
)


def distribution_drift(
    before: DataFrame,
    after: DataFrame,
    bucket,
) -> DataFrame:
    """Distribution drift between two snapshots of the same column: bin
    both sides with the same ``bucket`` expression, then report per-bin
    counts, per-bin probability masses in exact integer micro-units, and
    the absolute mass shift — the per-bin decomposition of total
    variation distance (``TVD = sum(drift_micro) / 2e6``). The monitoring
    primitive behind "did this week's data move?" alerts.

    Exactness: masses are ``(1_000_000 * n_bin) div n_total`` — integer
    division, no floats anywhere, so the result hashes identically
    cross-engine (a PSI-style metric would drag ``ln`` in; TVD carries
    the same signal for thresholding and stays rational).

    Scale shape: tag-and-union then ONE bucket-keyed aggregation over
    both snapshots (map-side combinable; one shuffle of |buckets| rows
    per partition); the totals come from a second aggregate over the
    already-tiny bucket table and join back as a broadcast literal row.
    Buckets missing on one side naturally report zero mass there.

    An EMPTY ``before`` or ``after`` snapshot has no distribution to
    drift against — the masses would divide by a zero total (silent NULL
    columns in non-ANSI sessions, an anonymous DIVIDE_BY_ZERO in ANSI
    ones). The divisors are therefore guarded with ``raise_error`` so
    the job FAILS at execution with a NAMED error either way (no extra
    scan: the check rides the existing tiny bucket-counts aggregate).
    Both sides empty yields an empty result (no buckets, nothing to
    compare).

    Returns ``(bucket, n_before, n_after, p_micro, q_micro,
    drift_micro)`` ordered by bucket.
    """
    b = bucket if isinstance(bucket, Column) else F.col(bucket)
    tagged = before.select(b.alias("bucket"), F.lit(1).alias("_b")).unionAll(
        after.select(b.alias("bucket"), F.lit(0).alias("_b"))
    )
    counts = tagged.groupBy("bucket").agg(
        F.sum("_b").cast("long").alias("n_before"),
        F.sum(F.lit(1) - F.col("_b")).cast("long").alias("n_after"),
    )
    totals = counts.agg(
        F.sum("n_before").alias("_tb"), F.sum("n_after").alias("_ta")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_before",
            "n_after",
            F.expr(f"(1000000 * n_before) div {_GUARDED_TB}")
            .cast("long")
            .alias("p_micro"),
            F.expr(f"(1000000 * n_after) div {_GUARDED_TA}")
            .cast("long")
            .alias("q_micro"),
        )
        .withColumn(
            "drift_micro",
            F.abs(F.col("p_micro") - F.col("q_micro")).cast("long"),
        )
        .orderBy("bucket")
    )
