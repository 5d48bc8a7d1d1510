"""TPC-H parity completion (SURVEY.md §2.12 "TPC-H parity widened").

Rounds 1-4a covered Q1/Q3/Q4/Q5/Q7/Q10/Q13/Q14/Q18/Q21/Q22 in
``relational.py``.  This module adds the remaining eleven classic shapes —
Q2, Q6, Q8, Q9, Q11, Q12, Q15, Q16, Q17, Q19, Q20 — so every TPC-H query
shape has a declared, oracle-checked twin.

Schema adaptations (the driver testdata has no ``partsupp`` table and no
comment/commit-date/ship-mode columns — TESTDATA.md):

- **Derived supply view** (Q2/Q9/Q11/Q16/Q20): the part-supplier
  relationship is recovered from ``lineitem`` as the distinct
  ``(l_partkey, l_suppkey)`` pairs, with
  ``ps_cost_cents  = MIN(floor(l_extendedprice * 100 / l_quantity))`` (the
  cheapest observed per-unit price, in integer cents — floor of an IEEE
  double is bit-identical across engines, so the derived cost is exact) and
  ``ps_availqty = SUM(floor(l_quantity))`` (quantities are integer-valued).
  This preserves each query's SHAPE (the joins, the correlated subqueries,
  the decorrelation) while staying exactly reproducible in both engines.
- Date-window predicates replace comment/ship-mode filters, and the
  late-shipment predicate is ``l_shipdate > o_orderdate + N days`` (same
  adaptation Q4/Q21 use — the testdata has no commit/receipt dates).

Exactness conventions (registry.py): money goes through DECIMAL(18,2), the
Q9 profit is computed entirely in integer centi-cents (cents x discount
basis points) so the subtraction never touches floats, ratio outputs divide
two identical doubles (IEEE-deterministic), counts are BIGINT both sides,
and every ORDER BY carries a unique tie-break.

Scale notes (100 TB): the supply view is one exact shuffle on the
(part, supp) composite key — uniform, no hot keys; every min-cost /
threshold subquery decorrelates to a partial-aggregate + equi-join (never a
per-row correlated probe); region/nation/supplier/part dimensions broadcast;
scalar thresholds (Q11/Q15/Q17) are single-row broadcast joins computed
with one extra partial agg over the already-shuffled intermediate, not a
second scan of the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query


def _dec(col: str, prec: int = 18, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def _disc_price():
    """l_extendedprice * (1 - l_discount) in exact DECIMAL — the shared
    revenue term (identical formula text in every oracle below)."""
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    )


_SUPPLY_CTE = """
    supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(floor(l_extendedprice * 100 / l_quantity) AS BIGINT))
                 AS ps_cost_cents,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                 AS ps_availqty
      FROM lineitem
      GROUP BY l_partkey, l_suppkey)
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp stand-in (see module docstring): one exact shuffle
    on the uniform (part, supp) composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.floor(F.col("l_extendedprice") * 100 / F.col("l_quantity"))
            .cast("bigint")
        ).alias("ps_cost_cents"),
        F.sum(F.floor("l_quantity").cast("bigint")).alias("ps_availqty"),
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-aggregate, every predicate pushed
# ---------------------------------------------------------------------------


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("P5", "A1", "A2"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical predicate-pushdown
    probe — a single lineitem scan where ALL three range predicates reach
    the parquet reader (`PushedFilters` shows shipdate/discount/quantity)
    and the plan is one partial+final agg with no shuffle of raw rows.
    Revenue = sum(extendedprice * discount) in exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 3, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q12 — priority classes by return flag (ship-mode stand-in)
# ---------------------------------------------------------------------------


@query(
    "tpch_q12_priority_classes",
    oracle="""
    SELECT l.l_returnflag AS return_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY return_class
    """,
    tags=("J1", "A2", "F8"),
)
def tpch_q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): conditional
    counts split one joined fact by priority class.  Adapted to this
    schema: the grouping key is l_returnflag (no l_shipmode column) and a
    "late" line shipped >90 days after its order date (no receipt/commit
    dates — the Q4/Q21 adaptation).  The CASE terms fold into the partial
    aggregate, so the shuffle carries two longs per group, not rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy(F.col("l_returnflag").alias("return_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("return_class")
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate blocks (OR-of-conjunctions pushdown)
# ---------------------------------------------------------------------------


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2))
                       - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11 AND l.l_returnflag = 'N')
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20 AND l.l_returnflag = 'N')
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("P5", "J1", "J3", "A2"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR of three conjunctive
    blocks): the classic disjunctive-pushdown probe.  Catalyst's
    constraint propagation extracts the per-side commons from the OR —
    part scans only brands {12,23,3} with size <= 15, lineitem only
    quantity 1..30 — so both scans prune before the join even though no
    single block filters alone.  part is broadcast; the residual OR is
    evaluated post-join inside codegen."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_returnflag", "l_extendedprice", "l_discount"
    )
    blocks = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        & (F.col("l_returnflag") == "N")
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "N")
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(blocks)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: scalar MAX subquery over a grouped CTE
# ---------------------------------------------------------------------------


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(3,2))
                    - CAST(l_discount AS DECIMAL(3,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("A2", "P7", "J3"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the view-plus-scalar-MAX shape.  The
    quarterly revenue-per-supplier aggregate is computed ONCE — the
    |suppliers|-row intermediate is persisted so the scalar-MAX branch and
    the equality join both read the cache instead of re-aggregating the
    fact (without the persist, Spark plans the agg subtree per branch and
    AQE's exchange reuse is not guaranteed to dedupe it) — then the max
    broadcasts back as a single-row join.  The revenue comparison happens
    in DECIMAL (exact), only the output casts to double.  Ties (two
    suppliers at the max) are kept, matching the SQL semantics."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_rev")
    ).localCheckpoint()  # eager per-invocation materialization: a bare
    # persist() pinned one CacheManager entry per plan for the whole
    # session (cache hygiene) and let a re-run read the cache instead of
    # computing (dishonest re-measurement); checkpoint blocks free on GC
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated AVG subquery, decorrelated exactly
# ---------------------------------------------------------------------------


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH perpart AS (
      SELECT l_partkey AS a_partkey,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem
      GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN perpart a ON a.a_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size < 15
      AND CAST(floor(l.l_quantity) AS BIGINT) * 5 * a.cnt < a.sum_qty
    """,
    tags=("P7", "A2", "J3"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated scalar-AVG
    subquery `l_quantity < 0.2 * (SELECT avg(l_quantity) ... same part)`.
    Decorrelated to one per-part partial aggregate joined back to the fact
    on partkey, and the float threshold is rewritten EXACTLY in integers:
    qty < 0.2 * sum/cnt  <=>  5 * qty * cnt < sum (quantities are
    integer-valued), so no engine ever compares a rounded average.  The
    brand/size filter applies AFTER the per-part average is computed over
    the full fact (faithful to the spec's inner query being unfiltered).
    p_size < 15 stands in for the container predicate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    perpart = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.floor("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    qty = F.floor("l_quantity").cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(perpart, li.l_partkey == perpart.a_partkey)
        .filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: two nation arms + conditional ratio
# ---------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH v AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(3,2))
                  - CAST(l.l_discount AS DECIMAL(3,2))) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey  = l.l_orderkey
      JOIN customer c ON c.c_custkey   = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey  = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey   = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM v
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J1", "J3", "A2", "F8"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue sold into ASIA, by order year.  The snowflake resolves with
    ONE fact shuffle (lineitem x orders on orderkey); customer resolves
    the buyer arm and supplier/nation the seller arm, all broadcast, as is
    part.  Numerator and denominator are both exact DECIMAL sums; the
    ratio divides the two resulting doubles with identical formula text in
    both engines (IEEE-deterministic)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("sn_key")
    )
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    v = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("sn_key") == F.col("ns_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(22,4)")
        )
    ).cast("double")
    return (
        v.groupBy("o_year")
        .agg((num / F.sum("volume").cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit, exact integer centi-cent arithmetic
# ---------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    oracle="""
    WITH """ + _SUPPLY_CTE + """,
    profit AS (
      SELECT ns.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
               - sp.ps_cost_cents * CAST(floor(l.l_quantity) AS BIGINT) * 100
               AS amount_cc
      FROM lineitem l
      JOIN supply sp  ON sp.ps_partkey = l.l_partkey
                     AND sp.ps_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey   = l.l_partkey
      JOIN supplier s ON s.s_suppkey   = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN orders o   ON o.o_orderkey  = l.l_orderkey
      WHERE p.p_name LIKE '%red%')
    SELECT nation, o_year,
           CAST(CAST(SUM(amount_cc) AS BIGINT) AS DOUBLE) / 10000.0
               AS sum_profit
    FROM profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("J1", "J3", "A2", "F7"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on 'red' parts by supplier
    nation and order year, where profit = revenue - supply cost.  The
    supply cost comes from the derived supply view (module docstring), and
    the whole amount is computed in integer CENTI-CENTS —
    price_cents * (100 - discount_basis_points) - cost_cents * qty * 100 —
    so the subtraction and the sum are exact BIGINT arithmetic in both
    engines; only the final display value divides to dollars.  Two fact
    shuffles total: lineitem x supply on (partkey, suppkey) and the result
    x orders on orderkey; part/supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    sp = _supply(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount_cc = (
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
        * (F.lit(100).cast("bigint") - F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint"))
        - F.col("ps_cost_cents") * F.floor("l_quantity").cast("bigint") * 100
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            sp,
            (li.l_partkey == sp.ps_partkey) & (li.l_suppkey == sp.ps_suppkey),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            amount_cc.alias("amount_cc"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("amount_cc").cast("double") / 10000.0).alias("sum_profit")
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier: correlated MIN subquery over a regional slice
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH """ + _SUPPLY_CTE + """,
    eligible AS (
      SELECT sp.ps_partkey, sp.ps_suppkey, sp.ps_cost_cents
      FROM supply sp
      JOIN supplier s ON s.s_suppkey   = sp.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           CAST(e.ps_cost_cents AS DOUBLE) / 100.0 AS supplycost
    FROM eligible e
    JOIN part p     ON p.p_partkey   = e.ps_partkey
    JOIN supplier s ON s.s_suppkey   = e.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 15
      AND e.ps_cost_cents = (SELECT MIN(e2.ps_cost_cents) FROM eligible e2
                             WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("P7", "J1", "J3", "O1", "O2"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each LARGE part sized 10-15,
    the EUROPE supplier(s) offering the minimum supply cost.  The
    correlated `= (SELECT MIN ... WHERE same part)` decorrelates to a
    per-part MIN partial aggregate over the regional supply slice joined
    back on (partkey, min_cost) — cost compares in integer cents, so the
    equality is exact and ties keep every tied supplier, matching SQL.
    The regional slice is persisted (bounded by the regional pair count)
    so the MIN branch and the join-back both read the cache.
    ORDER BY + LIMIT compiles to TakeOrderedAndProject."""
    sp = _supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        sp.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                sp.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_cost_cents")
        .localCheckpoint()  # see tpch_q15: per-invocation, GC-freed
    )
    min_cost = eligible.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_cost_cents").alias("min_cents")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 15)
    ).select("p_partkey", "p_name")
    return (
        eligible.join(
            min_cost,
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            (F.col("ps_cost_cents").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"),
            F.col("p_partkey"),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: grouped value vs a scalar fraction of the total
# ---------------------------------------------------------------------------


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH """ + _SUPPLY_CTE + """,
    natsupply AS (
      SELECT sp.ps_partkey, sp.ps_cost_cents * sp.ps_availqty AS value_cents
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'),
    grouped AS (
      SELECT ps_partkey,
             CAST(SUM(value_cents) AS BIGINT) AS part_value_cents
      FROM natsupply
      GROUP BY ps_partkey)
    SELECT ps_partkey,
           CAST(part_value_cents AS DOUBLE) / 100.0 AS part_value
    FROM grouped
    WHERE part_value_cents * 500 >
          (SELECT CAST(SUM(value_cents) AS BIGINT) FROM natsupply)
    ORDER BY part_value_cents DESC, ps_partkey
    """,
    tags=("P7", "A2", "J3", "O1"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose NATION_7
    inventory value exceeds 0.2% of that nation's total.  The HAVING-vs-
    scalar-subquery shape: the nation-sliced supply values (bounded by the
    distinct part-supplier pair count, far smaller than the fact) are
    persisted once; the per-part aggregate and the scalar total both read
    that cache, so the supply view is never recomputed and the fact is
    scanned once.  The fractional threshold is rewritten
    exactly in integers (value * 500 > total <=> value > total * 0.002),
    so no engine compares floats."""
    sp = _supply(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    natsupply = (
        sp.join(F.broadcast(s), sp.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
        .localCheckpoint()  # see tpch_q15: per-invocation, GC-freed
    )
    grouped = natsupply.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("part_value_cents")
    )
    total = natsupply.agg(F.sum("value_cents").alias("total_cents"))
    return (
        grouped.join(F.broadcast(total))
        .filter(F.col("part_value_cents") * 500 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("part_value_cents").cast("double") / 100.0).alias("part_value"),
            "part_value_cents",
        )
        .orderBy(F.col("part_value_cents").desc(), F.col("ps_partkey"))
        .drop("part_value_cents")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes: NOT IN -> anti join + distinct
# ---------------------------------------------------------------------------


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT sp.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply sp
    JOIN part p ON p.p_partkey = sp.ps_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND sp.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("J5", "A3", "J3", "O1"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part/supplier relationship): distinct supplier counts per
    (brand, type, size) bucket, excluding flagged suppliers.  The NOT IN
    subquery decorrelates to a LEFT ANTI join (s_suppkey is non-null, so
    NOT IN == anti join here; negative account balance stands in for the
    complaints-comment filter).  The supply pairs come pre-deduped from
    the same uniform (part, supp) shuffle the other derived-supply queries
    use; part is broadcast and count(DISTINCT) runs on the pruned pairs."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(bad), pairs.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), pairs.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"),
            F.col("p_size"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential promotion: nested IN subqueries over per-pair aggregates
# ---------------------------------------------------------------------------


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH shipped97 AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    stock AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS stock_qty
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    candidates AS (
      SELECT DISTINCT st.sp_suppkey
      FROM stock st
      JOIN shipped97 sh ON sh.l_partkey = st.sp_partkey
                       AND sh.l_suppkey = st.sp_suppkey
      JOIN part p ON p.p_partkey = st.sp_partkey
      WHERE p.p_name LIKE 'red%' AND sh.qty97 * 2 > st.stock_qty)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_4', 'NATION_14')
      AND s.s_suppkey IN (SELECT sp_suppkey FROM candidates)
    ORDER BY s.s_name
    """,
    tags=("J4", "P7", "A2", "J3"),
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers in two nations whose
    1997 shipments of 'red' parts ran hot against historical stock.  The
    spec's doubly-nested IN (suppkey IN (... partkey IN (...) AND availqty
    > 0.5 * shipped))) decorrelates to two per-(part,supp) partial
    aggregates over date-disjoint slices of ONE fact table, an exact
    integer threshold (2 * qty97 > stock, quantities integer-valued), a
    broadcast part-name semi-filter, and a final LEFT SEMI join into
    supplier — no correlated probe, no row explosion."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    cut97 = F.lit("1997-01-01 00:00:00").cast("timestamp")
    cut98 = F.lit("1998-01-01 00:00:00").cast("timestamp")
    shipped97 = (
        li.filter((F.col("l_shipdate") >= cut97) & (F.col("l_shipdate") < cut98))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("qty97"))
    )
    stock = (
        li.filter(F.col("l_shipdate") < cut97)
        .groupBy(
            F.col("l_partkey").alias("sp_partkey"),
            F.col("l_suppkey").alias("sp_suppkey"),
        )
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("stock_qty"))
    )
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    candidates = (
        stock.join(
            shipped97,
            (F.col("sp_partkey") == F.col("l_partkey"))
            & (F.col("sp_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(red), F.col("sp_partkey") == F.col("p_partkey"))
        .filter(F.col("qty97") * 2 > F.col("stock_qty"))
        .select("sp_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_14")
    ).select("n_nationkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .join(candidates, s.s_suppkey == candidates.sp_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
