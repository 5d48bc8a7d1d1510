"""Batch time-series query surface over the ``events`` table: sessionization
and gap-filling — the batch twins of the streaming session/tumbling windows
(plans/streaming_q.py), plus the ops a metrics/feature pipeline needs that
Spark has no single built-in for.

Oracle strategy: all integer/timestamp outputs (microsecond-exact), gap
thresholds compared in integer microseconds on both engines
(``unix_micros`` / ``epoch_us``) so sub-second timestamps can never straddle
a seconds-truncation boundary differently in the two engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

_GAP_US = 1800 * 1_000_000  # 30-minute session gap, in integer microseconds


@query(
    "ts1_batch_sessionize",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_seq
      FROM o)
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM s GROUP BY user_id, session_seq
    """,
    tags=("T6", "W2"),
)
def ts1_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch twin of the T6 streaming session
    window): a session breaks where the gap to the previous event exceeds
    30 minutes, session ids come from a running sum over the break flags —
    the classic lag+cumsum formulation, two window passes over ONE
    user-partitioned sort (Catalyst reuses the Exchange+Sort for both
    window functions and the final aggregate, so the whole query is a
    single shuffle on user_id — the plan you want when 100 TB of events
    sessionize into a feature store). Gap compared in integer microseconds
    on both engines.

    Reference parity: the reference has no sessionizer (its DAG fetches a
    single city's observation per 2-minute run, reference
    airflow/dags/weather_etl.py:103); this extends the events surface per
    the brief's training-pipeline mandate.
    """
    e = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(order)
    is_new = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > F.lit(_GAP_US)),
        1,
    ).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(run).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "ts2_gap_fill_hourly",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM events GROUP BY user_id, date_trunc('hour', ts)),
    hb AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM obs GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM hb)
    SELECT g.user_id, g.hr,
           COALESCE(o.n_obs, 0) AS n_events,
           last_value(o.n_obs IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hr
               ROWS UNBOUNDED PRECEDING) AS carried_n
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
    """,
    tags=("W3", "F5"),
)
def ts2_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + forward-fill: densify each user's hourly event
    counts over their own [first, last] hour (sequence + explode builds the
    grid; the per-user grid is bounded by the user's span so the explode
    can't run away), left-join observations, zero-fill the count, and
    carry the last observed count forward with last(ignorenulls) — the
    standard missing-data treatment before a time-series feature join.
    Scale: the grid build and the fill are both partitioned by user_id;
    with AQE the small grid side of the join broadcast-localizes. The
    first grid row per user is observed by construction, so carried_n is
    never NULL."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    fill = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.join(obs, ["user_id", "hr"], "left")
        .select(
            "user_id",
            "hr",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_events"),
            F.last("n_obs", ignorenulls=True).over(fill).alias("carried_n"),
        )
    )


@query(
    "ts3_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id)
    SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS stage
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    tags=("W2", "A2", "J2"),
)
def ts3_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): each stage's
    timestamp is the first qualifying event STRICTLY AFTER the previous
    stage — the sequential constraint that makes funnels more than three
    GROUP BYs. Three aggregates all keyed on user_id: Catalyst reuses the
    hash partitioning across the chain, so the funnel costs one logical
    shuffle of each event subset, not three independent ones. stage
    column = how far the user got (1/2/3)."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            (
                F.lit(1)
                + F.col("first_click").isNotNull().cast("int")
                + F.col("first_purchase").isNotNull().cast("int")
            )
            .cast("long")
            .alias("stage"),
        )
    )


@query(
    "ts4_cumulative_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS TIMESTAMP) AS first_day
      FROM events GROUP BY user_id),
    daily_new AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day),
    days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events)
    SELECT d.day,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(sum(COALESCE(n.new_users, 0)) OVER (
               ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_users
    FROM days d LEFT JOIN daily_new n ON n.day = d.day
    """,
    tags=("A3", "W3"),
)
def ts4_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user count per day — the metric a naive
    count(DISTINCT) over an expanding window cannot compute scalably
    (quadratic re-scan). The scalable identity: a user contributes
    exactly once, on their FIRST day, so cumulative distinct = running
    sum of first-appearance counts. Two small aggregates + one ordered
    prefix sum over the (tiny) day spine; the expensive distinct state
    collapses map-side into min(day) per user."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day.alias("d")).alias("first_day"))
    daily_new = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    days = e.select(day.alias("day")).distinct()
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(daily_new, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"))
        .withColumn(
            "cumulative_users", F.sum("new_users").over(run).cast("long")
        )
    )


@query(
    "ts5_weekly_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events)
    SELECT c.cohort_week,
           CAST(date_diff('week', c.cohort_week, a.active_week) AS BIGINT)
               AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM cohort c JOIN activity a ON a.user_id = c.user_id
    GROUP BY c.cohort_week,
             date_diff('week', c.cohort_week, a.active_week)
    """,
    tags=("A2", "J1", "F5"),
)
def ts5_weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week, counted
    in each later week they return — the canonical product-analytics
    rollup. Both aggregates key on user_id, so the cohort attach is a
    same-key join that reuses the partitioning; the output is
    (cohort, offset) — thousands of rows from billions of events.
    Week arithmetic runs on date_trunc('week') boundaries in both engines
    (Monday-start ISO weeks in Spark and DuckDB alike)."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    cohort = e.groupBy("user_id").agg(F.min(wk.alias("w")).alias("cohort_week"))
    activity = e.select("user_id", wk.alias("active_week")).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .select("cohort_week", "week_offset", "n_active")
    )


@query(
    "ts6_linear_interpolation",
    oracle="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, max(value) AS v
      FROM events GROUP BY 1, 2),
    hb AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM obs GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM hb),
    j AS (
      SELECT g.user_id, g.hr, epoch_us(g.hr) AS hus, o.v,
             last_value(o.v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN o.v IS NOT NULL THEN epoch_us(g.hr) END
                        IGNORE NULLS) OVER wp AS ph,
             first_value(o.v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN o.v IS NOT NULL THEN epoch_us(g.hr) END
                         IGNORE NULLS) OVER wn AS nh
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
      WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.hr
                    ROWS UNBOUNDED PRECEDING),
             wn AS (PARTITION BY g.user_id ORDER BY g.hr
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hr,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv) * (CAST(hus - ph AS DOUBLE)
                                       / CAST(nh - ph AS DOUBLE)) END
               AS value_filled,
           (v IS NULL) AS is_interpolated
    FROM j
    """,
    tags=("W3", "F5", "F7"),
)
def ts6_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the densified hourly grid (the numeric
    upgrade of ts2's forward-fill): missing hours get
    ``v0 + (v1-v0) * (t-t0)/(t1-t0)`` between the straddling observed
    points. Exactness by construction: the anchor series is max(value)
    per hour (selection, no summation), the time ratio is a small-integer
    microsecond difference cast to double, and the interpolation is four
    IEEE double ops evaluated in the SAME parse order in both engines —
    scalar float arithmetic is bit-deterministic, only reductions and
    libm calls drift, and this uses neither. Grid endpoints are observed
    by construction so interior gaps always have both anchors.

    Scale: everything is partitioned by user_id — the grid explode, the
    join, and BOTH window passes share one hash partitioning (Catalyst
    reuses the Exchange; the forward and backward fills are two Sort
    passes, no extra shuffle). Per-user grids are bounded by the user's
    own observed span, so a sparse 100 TB corpus cannot explode into an
    unbounded calendar."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.max("value").alias("v"))
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        )
    )
    wp = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    hus = F.unix_micros(F.col("hr"))
    obs_h = F.when(F.col("v").isNotNull(), hus)
    j = (
        grid.join(obs, ["user_id", "hr"], "left")
        .withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(obs_h, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(wn))
    )
    ratio = (hus - F.col("ph")).cast("double") / (F.col("nh") - F.col("ph")).cast(
        "double"
    )
    return j.select(
        "user_id",
        "hr",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * ratio)
        .alias("value_filled"),
        F.col("v").isNull().alias("is_interpolated"),
    )


@query(
    "ts7_ohlc_bars",
    oracle="""
    WITH x AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rna,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events)
    SELECT event_type, hr,
           max(CASE WHEN rna = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rnd = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_obs
    FROM x GROUP BY event_type, hr
    """,
    tags=("A2", "O4", "F5"),
)
def ts7_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling to OHLC bars — hourly open/high/low/close of ``value``
    per event_type, the standard lossy compaction before charting or
    feature extraction on a tick-shaped stream. open/close are
    ``min_by``/``max_by`` over the composite (ts, event_id) order (exact
    selection, unique tie-break key), high/low are plain min/max — no
    arithmetic on doubles anywhere, so the float outputs hash exactly.
    The oracle states the same bars with rank-1 row_number picks, because
    DuckDB's arg_min can't take a composite order key.

    Scale: ONE shuffle on (event_type, hr); min_by/max_by partial-combine
    map-side like any other aggregate, so the bar table leaving each
    mapper is bounded by bars-per-mapper, not ticks — the right shape for
    compacting a 100 TB tick archive to bars."""
    e = load_table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )


# --- ts8: truncated-window EWMA ------------------------------------------
# alpha = 0.5, so the lag weights (1-alpha)^k are exact powers of two —
# every constant below is exactly representable and every product/ sum is a
# single correctly-rounded IEEE op. The EWMA is truncated at 8 lags (weight
# beyond lag 7 is < 0.4% of the mass) so the whole reduction is a FIXED
# written-order scalar expression `x + 0.5*lag1 + ... + 0.0078125*lag7`
# evaluated identically in Spark and DuckDB — no float SUM aggregate, no
# engine-dependent reduction order. (The same discipline as the a14
# sufficient-statistics and BM25 fixed-order scoring.)
_EWMA_WEIGHTS = ["1.0", "0.5", "0.25", "0.125", "0.0625", "0.03125", "0.015625", "0.0078125"]


def _ewma_num_sql() -> str:
    terms = ["value"]
    for k, w in enumerate(_EWMA_WEIGHTS[1:], start=1):
        terms.append(f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 "
                     f"ELSE {w} * lag(value, {k}) OVER w END")
    return " + ".join(terms)


def _ewma_den_sql() -> str:
    terms = ["1.0"]
    for k, w in enumerate(_EWMA_WEIGHTS[1:], start=1):
        terms.append(f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w} END")
    return " + ".join(terms)


@query(
    "ts8_ewma_smoothing",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             ({_ewma_num_sql()}) / ({_ewma_den_sql()}) AS ewma8,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
                 AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id, ts, value, ewma8 FROM s WHERE rn <= 3
    """,
    tags=("W2", "W3"),
)
def ts8_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.5, adjusted form)
    over each user's event-value series, truncated at 8 lags; returns the
    3 most recent smoothed points per user.

    Hash-exactness: the EWMA reduction is materialized as a fixed
    written-order scalar expression over ``lag(value, k)`` columns with
    power-of-two weights (module comment above) — both engines evaluate
    the identical IEEE op sequence, so the doubles hash bit-exactly. The
    adjusted-EWMA denominator drops exactly the weights whose lag is
    missing at the head of the series.

    Scale shape: ONE shuffle on user_id — the lag window, the recency
    row_number, and the final filter all reuse the same
    Exchange+Sort(user_id, ts) (Catalyst plans a single sort for both
    window specs' partition key; the DESC ordering is a separate Sort but
    no new Exchange). At 100 TB of events this is the same shape as
    ts1's sessionizer: per-entity ordered state, never a global sort.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.expr("value")
    den = F.lit(1.0)
    for k, wt in enumerate(_EWMA_WEIGHTS[1:], start=1):
        lagk = F.lag("value", k).over(w)
        num = num + F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(float(wt)) * lagk)
        den = den + F.when(lagk.isNull(), F.lit(0.0)).otherwise(F.lit(float(wt)))
    recency = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.select(
            "user_id", "event_id", "ts", "value",
            (num / den).alias("ewma8"),
            F.row_number().over(recency).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "ts9_rolling_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d JOIN ud u
      ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
    GROUP BY d.day
    """,
    tags=("W3", "A3", "J7"),
)
def ts9_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the metric Spark's
    window frames cannot express natively (COUNT DISTINCT over a RANGE
    frame is unsupported), so the Spark-first formulation is explicit:
    dedupe to (user, day) FIRST (the big shrink — one shuffle over
    events), then a bounded range self-join of the tiny day spine against
    the deduped table, then distinct-count per day. The range join fans
    each (user, day) to ≤7 spine days, so the join output is ≤7×|ud| —
    bounded regardless of raw event volume; at 100 TB the dedup does all
    the heavy lifting and everything after runs on day-granular data."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    j = days.alias("d").join(
        ud.alias("u"),
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") > F.col("d.day") - F.expr("INTERVAL 7 DAY")),
    )
    return j.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("u.user_id").cast("long").alias("wau")
    )


# --- ts10: rolling z-score anomalies (8-lag fixed-order sufficient stats) --
# Same cross-engine float discipline as ts8/a14: the trailing window's
# sufficient statistics (n, sum, sum-of-squares) are FIXED written-order
# scalar expressions over lag() columns; mean/variance/z follow as single
# IEEE ops (sqrt is IEEE correctly-rounded in every conforming runtime),
# so both engines compute bit-identical doubles and take identical
# branches at the |z| > 2 threshold.


def _lag_terms(expr: str, agg: str) -> str:
    terms = [expr.format(v="value")]
    for k in range(1, 8):
        lk = f"lag(value, {k}) OVER w"
        terms.append(
            f"CASE WHEN {lk} IS NULL THEN 0.0 ELSE {expr.format(v=lk)} END"
            if agg == "sum"
            else f"CASE WHEN {lk} IS NULL THEN 0.0 ELSE 1.0 END"
        )
    return " + ".join(terms)


_ZS_N = _lag_terms("{v}", "count").replace("value", "1.0", 1)
_ZS_S = _lag_terms("{v}", "sum")
_ZS_S2 = _lag_terms("({v} * {v})", "sum")


@query(
    "ts10_rolling_zscore",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             ({_ZS_N}) AS n, ({_ZS_S}) AS s, ({_ZS_S2}) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    z AS (
      SELECT user_id, event_id, ts, value,
             (s2 - (s * s) / n) / n AS var,
             (value - s / n) AS dev
      FROM s WHERE n >= 4.0)
    SELECT user_id, event_id, ts, value,
           dev / sqrt(var) AS zscore
    FROM z
    WHERE var > 0.0 AND abs(dev / sqrt(var)) > 2.0
    """,
    tags=("W3", "A14"),
)
def ts10_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against its
    trailing 8-observation window's mean/variance (computed from
    fixed-order sufficient statistics — module comment above); rows with
    |z| > 2 flag as anomalies. Windows shorter than 4 observations are
    skipped (variance meaningless). ONE shuffle on user_id; every
    downstream op is a scalar expression on the sorted stream — the
    standard streaming-compatible anomaly screen for a 100 TB metrics
    archive."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n = F.lit(1.0)
    s = F.col("value")
    s2 = F.col("value") * F.col("value")
    for k in range(1, 8):
        lk = F.lag("value", k).over(w)
        n = n + F.when(lk.isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
        s = s + F.when(lk.isNull(), F.lit(0.0)).otherwise(lk)
        s2 = s2 + F.when(lk.isNull(), F.lit(0.0)).otherwise(lk * lk)
    base = e.select(
        "user_id", "event_id", "ts", "value",
        n.alias("n"), s.alias("s"), s2.alias("s2"),
    ).filter(F.col("n") >= 4.0)
    var = (F.col("s2") - (F.col("s") * F.col("s")) / F.col("n")) / F.col("n")
    dev = F.col("value") - F.col("s") / F.col("n")
    z = base.select(
        "user_id", "event_id", "ts", "value",
        var.alias("var"), dev.alias("dev"),
    )
    zscore = F.col("dev") / F.sqrt(F.col("var"))
    return (
        z.filter((F.col("var") > 0.0) & (F.abs(zscore) > 2.0))
        .select("user_id", "event_id", "ts", "value", zscore.alias("zscore"))
    )


@query(
    "w8_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type, ts AS t_start,
             ts + to_minutes(CAST(floor(value) AS BIGINT)) AS t_end
      FROM events),
    pts AS (
      SELECT event_type, t_start AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, t_end AS t, -1 AS delta FROM iv),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
      FROM pts)
    SELECT r.event_type,
           CAST(max(r.c) AS BIGINT) AS max_concurrent,
           CAST((SELECT count(*) FROM iv i WHERE i.event_type = r.event_type)
                AS BIGINT) AS n_intervals
    FROM run r GROUP BY r.event_type
    """,
    tags=("W3", "A2", "TS1"),
)
def w8_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event opens a half-open
    session ``[ts, ts + floor(value) minutes)``; the answer is the max
    number simultaneously open — the sweep-line statistic behind
    capacity planning and concurrent-sessions SLOs.

    The ENGINE side runs the distributed two-pass prefix sum
    (operators/sweep.max_concurrency): bucket-local ordered windows in
    parallel plus one tiny bucket-level prefix — the textbook
    one-window sweep the ORACLE states would serialize the whole fact
    through one task per key at scale (event_type has a handful of
    values), which is exactly the shape this operator exists to avoid.
    A green hash proves the decomposition exact: prefix sums are
    associative, and tie order within one instant only permutes equal
    deltas (ends sort before starts, so touching intervals never
    overlap)."""
    from ..operators.sweep import max_concurrency

    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.col("ts").alias("t_start"),
        F.expr(
            "ts + make_interval(0, 0, 0, 0, 0, CAST(floor(value) AS INT), 0)"
        ).alias("t_end"),
    )
    return max_concurrency(iv, "event_type")


@query(
    "w9_capped_running_sum",
    oracle="""
    WITH RECURSIVE f AS (
      SELECT user_id, event_id, CAST(floor(value) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS rn
      FROM events WHERE user_id < 40),
    r AS (
      SELECT user_id, rn, event_id, v AS acc_after,
             CASE WHEN v >= 100 THEN CAST(0 AS BIGINT) ELSE v END AS carry
      FROM f WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn, f.event_id, r.carry + f.v AS acc_after,
             CASE WHEN r.carry + f.v >= 100 THEN CAST(0 AS BIGINT)
                  ELSE r.carry + f.v END AS carry
      FROM r JOIN f ON f.user_id = r.user_id AND f.rn = r.rn + 1)
    SELECT user_id, event_id, acc_after, acc_after >= 100 AS flushed
    FROM r
    """,
    tags=("W3", "T8", "P9"),
)
def w9_capped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota/batching fold: per user, a running sum of floor(value) that
    FLUSHES whenever it reaches 100 — each event reports the accumulator
    including itself and whether it triggered a flush. The fold is
    non-associative (every reset is a data-dependent branch), so no
    window frame or prefix-sum decomposition expresses it: the engine
    runs the canonical ``applyInPandas`` per-key sequential scan
    (operators/sweep.capped_running_sum — keys in parallel, per-key work
    bounded), and the oracle is the recursive CTE that SQL needs for the
    same semantics. A green hash is the §2.10 witness that the Arrow
    Pandas path and recursive SQL agree row-for-row."""
    from ..operators.sweep import capped_running_sum

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.expr("CAST(floor(value) AS BIGINT)").alias("v"),
        )
    )
    return capped_running_sum(e, "user_id", ["ts", "event_id"], "v", cap=100)


@query(
    "ts11_markov_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    t AS (
      SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM o WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE) /
             CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE)
               AS p_transition
    FROM t
    """,
    tags=("TS11", "W2"),
)
def ts11_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count (prev_type -> next_type) adjacencies, normalize per source state
    — the behavioral-model / next-event-prediction feature every activity
    pipeline derives. One user-partitioned window sort (the same Exchange
    the sessionizer reuses), one map-side-combinable count aggregation;
    the normalizing window runs over the |types|^2-row transition table,
    so the final pass is driver-trivial at any corpus scale. Probability
    is an exact bigint/bigint double division — bit-identical
    cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp).cast("double")
        ).alias("p_transition"),
    )
