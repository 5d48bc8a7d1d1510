"""Streaming query surface (SURVEY.md §2.9 T1-T8) for the driver contract.

Each query runs a REAL Structured Streaming job (file source -> watermark
-> stateful op -> memory sink, availableNow) and returns the drained
result. The DuckDB oracles reproduce both the aggregation AND the
watermark emission rule (windows whose end <= max(ts) - delay) — see
``streaming/windows.py`` for the validated semantics.

The weather micro-batch pipeline (T1-T3) is exercised as a rows-only
query: its landing-dir/sink/checkpoint are throwaway temp dirs, which the
oracle cannot see, but determinism (3 rows, fixed values) is asserted by
tests/test_weather_fidelity.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import CANNED_WEATHER
from ..functions.weather import require_utc_session
from ..io import load_table, scratch_dir
from ..streaming import pipeline, windows
from .registry import query

_DELAY_SQL = "INTERVAL '1 hour'"


@query(
    "t5_tumbling_window_counts",
    oracle=f"""
    WITH m AS (SELECT max(ts) AS mx FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
             time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2, 3)
    SELECT agg.* FROM agg, m WHERE window_end <= mx - {_DELAY_SQL}
    """,
    tags=("T4", "T5"),
)
def t5_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-day tumbling windows per event_type, run as a real
    stream; append mode emits only watermark-finalized windows.
    ``window()`` buckets on the session TZ, so non-UTC fails fast instead
    of silently shifting day edges (NOTES.md TZ rule)."""
    ev = windows.stream_events(spark, sf_dir)
    require_utc_session(ev)
    return windows.run_available_now(windows.tumbling_counts(ev))


@query(
    "t5_sliding_window_counts",
    oracle=f"""
    WITH m AS (SELECT max(ts) AS mx FROM events),
    starts AS (
      SELECT event_type, ts,
             time_bucket(INTERVAL '12 hours', ts) - (k * INTERVAL '12 hours')
                 AS window_start
      FROM events, (SELECT unnest([0, 1]) AS k) ks),
    agg AS (
      SELECT window_start, window_start + INTERVAL '1 day' AS window_end,
             event_type, count(*) AS n_events
      FROM starts GROUP BY 1, 2, 3)
    SELECT agg.* FROM agg, m WHERE window_end <= mx - {_DELAY_SQL}
    """,
    tags=("T5",),
)
def t5_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows sliding every 12h: each event belongs to exactly two
    windows (window = 2 x slide); oracle enumerates both starts.
    Non-UTC sessions fail fast — ``window()`` buckets on session TZ."""
    ev = windows.stream_events(spark, sf_dir)
    require_utc_session(ev)
    return windows.run_available_now(windows.sliding_counts(ev))


@query(
    "t6_session_windows",
    oracle=f"""
    WITH e AS (SELECT user_id, ts FROM events WHERE user_id < 30),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '2 hours'
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    agg AS (
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL '2 hours' AS session_end,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid),
    m AS (SELECT max(ts) AS mx FROM events WHERE user_id < 30)
    SELECT agg.* FROM agg, m WHERE session_end <= mx - {_DELAY_SQL}
    """,
    tags=("T6",),
)
def t6_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (2h gap) per user for user_id < 30; the
    oracle is the classic gaps-and-islands rewrite plus the emission rule."""
    ev = windows.stream_events(spark, sf_dir).filter(F.col("user_id") < 30)
    return windows.run_available_now(windows.session_windows(ev))


@query(
    "t7_stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE user_id < 10
    """,
    tags=("T7",),
)
def t7_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful dedup: the same events land twice as two files
    processed as two micro-batches (maxFilesPerTrigger=1);
    dropDuplicatesWithinWatermark's key state removes the second copy, so
    the stream's output equals the plain distinct relation."""
    from ..io import load_table

    landing = scratch_dir("dedup_land_")
    batch = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    windows.land_events_json(batch, landing, copies=2)

    stream = (
        spark.readStream.schema(
            "event_id long, ts string, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(landing)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    deduped = windows.dedup_within_watermark(stream, ["event_id"])
    out = windows.run_available_now(deduped)
    return out.select("event_id", "user_id", "event_type")


@query(
    "t8_stateful_user_stats",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(value) AS max_value
    FROM events WHERE user_id < 20
    GROUP BY user_id
    """,
    tags=("T8",),
)
def t8_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful op (applyInPandasWithState): per-user running
    (count, max) in explicit group state; a single availableNow batch makes
    the emitted running totals equal the batch aggregate."""
    ev = windows.stream_events(spark, sf_dir).filter(F.col("user_id") < 20)
    return windows.run_available_now(
        windows.stateful_user_stats(ev), output_mode="update"
    )


@query(
    "t9_stream_stream_join",
    oracle="""
    SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL '1 hour'
    WHERE e.event_type = 'error' AND c.event_type = 'click'
      AND e.user_id < 50
    """,
    tags=("T4", "T5"),
)
def t9_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner self-join with event-time range condition:
    every (click, error-within-1h) pair per user. Watermarks on both
    sides + the time constraint bound the join state Spark must buffer —
    the condition that makes stream-stream joins feasible on unbounded
    input. availableNow drains in one batch, so the buffered join equals
    the batch theta join the oracle runs."""
    clicks = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 50))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("user_id") < 50))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("error_id", "click_id", "user_id")
    return windows.run_available_now(joined)


@query(
    "t11_stream_outer_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id cid, user_id u, ts cts FROM events
      WHERE event_type = 'click' AND user_id < 20),
    errors AS (
      SELECT event_id eid, user_id u, ts ets FROM events
      WHERE event_type = 'error' AND user_id < 20),
    m AS (SELECT least((SELECT max(cts) FROM clicks),
                       (SELECT max(ets) FROM errors)) AS mn),
    pairs AS (
      SELECT c.cid, c.u, c.cts, e.eid
      FROM clicks c JOIN errors e
        ON e.u = c.u AND e.ets >= c.cts
       AND e.ets <= c.cts + INTERVAL 1 HOUR),
    unmatched AS (
      SELECT c.cid, c.u, c.cts, NULL::BIGINT AS eid FROM clicks c, m
      WHERE c.cid NOT IN (SELECT cid FROM pairs)
        AND c.cts + INTERVAL 2 HOUR < m.mn)
    SELECT cid AS click_id, u AS user_id, cts AS click_ts,
           eid AS error_id
    FROM (SELECT * FROM pairs UNION ALL SELECT * FROM unmatched)
    """,
    tags=("T4", "T5", "J2"),
)
def t11_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join (t9's outer sibling): every click
    pairs with its errors-within-1h, and clicks with NO error emit a
    null-padded row — but only once the state can never match again. The
    oracle encodes the exact emission rule (validated empirically at two
    SFs AND pinned at the exact boundary by
    tests/test_stream_outer_boundary.py, so a Spark semantics drift fails
    a named pytest instead of an opaque oracle hash): the combined
    watermark is min over both inputs of max(event time) - 1h, and an
    unmatched click emits iff its latest possible match time (c_ts + 1h)
    is strictly below it — i.e. ``c_ts + 2h < min(max_c, max_e)``. The
    watermark + time bound are what make outer results emittable at all
    on unbounded input: without them "no match" is undecidable."""
    clicks = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 20))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("user_id") < 20))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.col("c_ts").alias("click_ts"),
        "error_id",
    )
    return windows.run_available_now(joined)


@query(
    "t12_stream_full_outer_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id cid, user_id u, ts cts FROM events
      WHERE event_type = 'click' AND user_id < 15),
    errors AS (
      SELECT event_id eid, user_id u, ts ets FROM events
      WHERE event_type = 'error' AND user_id < 15),
    m AS (SELECT least((SELECT max(cts) FROM clicks),
                       (SELECT max(ets) FROM errors)) AS mn),
    pairs AS (
      SELECT c.cid, c.cts, e.eid, e.ets, c.u
      FROM clicks c JOIN errors e
        ON e.u = c.u AND e.ets >= c.cts
       AND e.ets <= c.cts + INTERVAL 1 HOUR),
    un_c AS (
      SELECT c.cid, c.cts, NULL::BIGINT AS eid, NULL::TIMESTAMP AS ets, c.u
      FROM clicks c, m
      WHERE c.cid NOT IN (SELECT cid FROM pairs)
        AND c.cts + INTERVAL 2 HOUR < m.mn),
    un_e AS (
      SELECT NULL::BIGINT AS cid, NULL::TIMESTAMP AS cts, e.eid, e.ets, e.u
      FROM errors e, m
      WHERE e.eid NOT IN (SELECT eid FROM pairs)
        AND e.ets + INTERVAL 1 HOUR < m.mn)
    SELECT cid AS click_id, eid AS error_id, u AS user_id,
           cts AS click_ts, ets AS error_ts
    FROM (SELECT * FROM pairs UNION ALL SELECT * FROM un_c
          UNION ALL SELECT * FROM un_e)
    """,
    tags=("T4", "T5", "J2"),
)
def t12_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join — the last streaming-join variant
    (t9 inner, t11 left): matched pairs plus BOTH sides' unmatched rows,
    each emitted only when its state can never match again. The oracle
    encodes the two watermark-eviction rules, pinned by a boundary-exact
    fixture (tests/test_stream_outer_boundary.py) rather than only
    validated on natural data: with the combined watermark base
    mn = min(max click ts, max error ts) and 1h delays both sides,
    an unmatched CLICK emits iff c_ts + 2h < mn (its last matchable
    error time c_ts+1h must fall strictly below the watermark mn - 1h)
    and an unmatched ERROR emits iff e_ts + 1h < mn (a matching click
    needs c_ts in [e_ts-1h, e_ts]; once the watermark passes e_ts no
    such click can arrive). Both inequalities are STRICT — the boundary
    rows in the pinning test prove it."""
    clicks = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 15))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("user_id") < 15))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    ).select(
        "click_id",
        "error_id",
        F.coalesce(F.col("c_user"), F.col("e_user")).alias("user_id"),
        F.col("c_ts").alias("click_ts"),
        F.col("e_ts").alias("error_ts"),
    )
    return windows.run_available_now(joined)


@query(
    "t13_stream_semi_join",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click' AND c.user_id < 25
      AND EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id
          AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR)
    """,
    tags=("T4", "J4"),
)
def t13_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream join — the streaming twin of J4: each
    click emits AT MOST ONCE, when its first error-within-1h arrives
    (multiple matches never duplicate it). Unlike the outer variants
    (t11/t12) there is NO watermark emission rule to encode: only
    matched rows emit, so the drained availableNow result equals the
    plain EXISTS relation and the oracle needs no least/max watermark
    arithmetic — the simplest exactly-checkable stream-stream variant.
    Watermarks + the time bound still govern STATE eviction (unmatched
    clicks are dropped, not emitted)."""
    clicks = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 25))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    errors = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("user_id") < 25))
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "1 hour")
    )
    joined = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("c_ts"))
        & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.col("c_ts").alias("click_ts"),
    )
    return windows.run_available_now(joined)


@query(
    "t10_stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment, e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment, e.event_type
    """,
    tags=("T5", "J3"),
)
def t10_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a static
    dimension (customer segment) and aggregates per (segment, type). The
    static side needs no watermark — Spark re-plans it per micro-batch and
    BROADCASTS it under the join (the standard dimension-enrichment shape:
    at 100 TB/day of events the dimension join must never shuffle the
    stream). Aggregation in complete mode over availableNow drains to the
    same totals as the batch oracle."""
    ev = windows.stream_events(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    enriched = ev.join(
        F.broadcast(customer), ev.user_id == customer.c_custkey
    )
    # exact count-distinct on a stream: aggregate per user in the stream
    # (bounded state: one row per (segment, type, user)), then count users
    # over the drained result — never an approx sketch in a declared output
    per_user = enriched.groupBy("segment", "event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_u")
    )
    drained = windows.run_available_now(per_user, output_mode="complete")
    return (
        drained.groupBy("segment", "event_type")
        .agg(
            F.sum("n_u").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    )


_T2_LITERAL_ORACLE = """
SELECT * FROM (VALUES
    ('Tunis', '2023-10-08 08:00:00', CAST(24.91 AS FLOAT), 'clear sky',
     CAST(57 AS INT), CAST(1015 AS INT), CAST(4.63 AS FLOAT),
     '2023-10-08 09:00:00'),
    ('Mumbai', '2023-10-08 08:30:00', CAST(31.2 AS FLOAT), 'haze',
     CAST(74 AS INT), CAST(1008 AS INT), CAST(2.1 AS FLOAT),
     '2023-10-08 14:00:00'),
    ('San Francisco', '2023-10-08 08:00:00', CAST(17.8 AS FLOAT), 'mist',
     CAST(81 AS INT), CAST(1012 AS INT), CAST(5.36 AS FLOAT),
     '2023-10-08 00:00:00')
) AS t(city, utc, temperature, weather, humidity, pressure, wind_speed, lt)
"""


@query("t2_weather_stream_upsert", oracle=_T2_LITERAL_ORACLE, tags=("T1", "T2", "T3"))
def t2_weather_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T3: land canned observations TWICE, drain the micro-batch file
    stream, return the sink — idempotence means exactly one copy per
    (city, utc) regardless of redelivery. Upgraded from rows-only to a
    literal-SELECT value oracle (the ref_weather pattern: the transform
    of a fixed input is a fixed output), so the duplicate-landing drain
    now carries a full value-hash check — a double-applied batch, a
    wrong column, or a drifted epoch/offset conversion hash-fails
    instead of merely keeping the row count at 3."""
    base = scratch_dir("weather_stream_")
    landing = os.path.join(base, "landing")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    pipeline.land_records(lambda: CANNED_WEATHER, landing)
    pipeline.land_records(lambda: CANNED_WEATHER, landing)
    q = pipeline.start_stream(spark, landing, sink, ckpt, available_now=True)
    q.awaitTermination(300)
    return spark.read.parquet(sink)


@query(
    "t15_stream_python_source",
    oracle="""
    WITH seq AS (SELECT unnest(generate_series(0, 199)) AS i),
    feed AS (
      SELECT (i % 2) AS station_id, (i // 2) AS obs_seq,
             ((i % 2) * 1000003 + (i // 2) * 7919) % 60000 - 20000 AS temp_c_milli,
             ['N','NE','E','SE','S','SW','W','NW'][((i % 2) + (i // 2)) % 8 + 1]
                 AS wind_dir
      FROM seq)
    SELECT wind_dir,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(temp_c_milli) AS BIGINT) AS sum_temp,
           CAST(min(obs_seq) AS BIGINT) AS first_seq
    FROM feed GROUP BY wind_dir
    """,
    tags=("T1", "S1", "T8"),
)
def t15_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python data source (SimpleDataSourceStreamReader,
    sources/pyds.py FeedStreamReader): the closed-form station feed
    arrives as a stream of cursor-offset micro-batches (the Spark-first
    re-expression of the reference's 2-minute polling DAG cadence,
    reference airflow/dags/weather_etl.py:25-32 — the poll loop becomes
    source offsets); availableNow drains all 200 observations through the
    offset protocol, a complete-mode aggregate folds them per wind
    direction, and the all-BIGINT oracle regenerates the same feed from
    generate_series. Crash-replay determinism (readBetweenOffsets
    regenerating byte-identical chunks) is what makes the green hash
    possible at all — a nondeterministic source could never match."""
    from ..sources import pyds

    pyds.register(spark)
    feed = (
        spark.readStream.format("weather_feed_stream")
        .option("stations", "2")
        .option("obs_per_station", "100")
        .load()
    )
    agg = feed.groupBy("wind_dir").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("temp_c_milli").alias("sum_temp"),
        F.min("obs_seq").alias("first_seq"),
    )
    return windows.run_available_now(agg, output_mode="complete")


@query(
    "t16_stream_file_sink",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM events WHERE user_id < 100
    GROUP BY event_type
    """,
    tags=("T2", "S8", "T1"),
)
def t16_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FILE sink with the exactly-once manifest protocol: the
    filtered event stream lands as parquet through writeStream (the
    `_spark_metadata` transaction log records exactly the committed
    files — a crashed/retried micro-batch can never double-expose rows,
    the same committer contract the s16 Python sink reimplements), then a
    batch read-back aggregates THROUGH the manifest. A green hash against
    the batch oracle proves end-to-end exactly-once from stream to files
    to readers. At 100 TB this is the bronze-layer landing shape:
    append-only parquet + manifest, compacted later by layout management
    (s10)."""
    import os as _os

    from ..io import scratch_dir
    from ..streaming import windows as _w

    ev = _w.stream_events(spark, sf_dir).filter(F.col("user_id") < 100)
    dst = scratch_dir("stream_sink")
    out = _os.path.join(dst, "landing")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", _os.path.join(dst, "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "file-sink drain did not finish within 300s — refusing to read "
            "a partially-committed manifest"
        )
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
    )


@query(
    "t17_stream_multibatch",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM events WHERE user_id < 100
    GROUP BY event_type
    """,
    tags=("T1", "T5"),
)
def t17_stream_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-micro-batch incremental aggregation: the filtered events
    land as 5 parquet files and the file stream is rate-limited with
    ``maxFilesPerTrigger=1``, so availableNow drains in ~5 successive
    micro-batches — unlike the single-batch drains elsewhere, this
    exercises real cross-batch STATE accumulation in the aggregation
    (each batch merges into the state store; tests/test_streaming_multibatch.py
    asserts the batch count). Complete-mode memory sink = the final
    accumulated snapshot, which must equal the batch aggregate regardless
    of how the files were batched — the correctness property incremental
    state maintenance promises at any scale."""
    agg = windows.multibatch_event_agg(spark, sf_dir, user_cap=100)
    # state keyed by event_type (a handful of keys): size the state
    # store to the KEY SPACE, not the core count (run_available_now doc)
    return windows.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )


@query(
    "t18_stream_union_fanin",
    oracle="""
    WITH u AS (
      SELECT 'clicks' AS feed, event_id, user_id FROM events
      WHERE event_type = 'click' AND user_id < 200
      UNION ALL
      SELECT 'errors' AS feed, event_id, user_id FROM events
      WHERE event_type = 'error' AND user_id < 200)
    SELECT feed,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_checksum,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM u GROUP BY feed
    """,
    tags=("T5", "U1"),
)
def t18_stream_union_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source FAN-IN topology: two independent file streams (the
    click feed and the error feed, each with its own source node and
    filter) union into ONE streaming aggregation — the merge shape every
    multi-region/multi-topic ingestion uses. Spark tracks offsets per
    source under the one query; the unioned aggregate accumulates state
    across both. availableNow drains both sources; the oracle is the
    batch union. At scale each source scales independently and the union
    adds no shuffle of its own (the aggregate's Exchange is the only
    one)."""
    clicks = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 200))
        .select(F.lit("clicks").alias("feed"), "event_id", "user_id")
    )
    errors = (
        windows.stream_events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("user_id") < 200))
        .select(F.lit("errors").alias("feed"), "event_id", "user_id")
    )
    agg = clicks.unionByName(errors).groupBy("feed").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
        F.max("user_id").cast("long").alias("max_user"),
    )
    # state keyed by feed (2 keys): state partitions track key space
    return windows.run_available_now(
        agg, output_mode="complete", state_partitions=8
    )


@query(
    "t19_stream_countmin",
    oracle="""
    WITH f AS (SELECT user_id FROM events WHERE user_id < 100),
    rws AS (SELECT unnest(generate_series(0, 3)) AS rw),
    sk AS (
      SELECT rw,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|'
                                      || CAST(rw AS VARCHAR)), 1, 8))
                  AS BIGINT) % 256 AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM f, rws
      GROUP BY rw, bucket),
    ex AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
      FROM f GROUP BY user_id
      ORDER BY n_exact DESC, user_id LIMIT 20),
    pr AS (
      SELECT ex.user_id, rw,
             CAST(('0x' || substr(md5(CAST(ex.user_id AS VARCHAR) || '|'
                                      || CAST(rw AS VARCHAR)), 1, 8))
                  AS BIGINT) % 256 AS bucket
      FROM ex, rws),
    est AS (
      SELECT pr.user_id, CAST(min(s.c) AS BIGINT) AS n_est
      FROM pr JOIN sk s ON s.rw = pr.rw AND s.bucket = pr.bucket
      GROUP BY pr.user_id)
    SELECT ex.user_id, ex.n_exact, est.n_est
    FROM ex JOIN est ON est.user_id = ex.user_id
    """,
    tags=("T1", "A4", "F12"),
)
def t19_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sketch maintenance: a Count-Min sketch of the user feed
    is maintained under a rate-limited multi-micro-batch file stream —
    each batch appends its bounded partial sketch via foreachBatch, and
    the merged sketch is the cell-wise sum (streaming/windows.
    stream_countmin_cells). Because CMS merge IS addition, the streamed
    sketch is row-identical to a one-shot batch sketch no matter how the
    stream was batched — so, uniquely among the streaming queries, this
    one carries a full EXACT oracle (the a23 restatement over the same
    feed): a green hash certifies batching-independence end to end.
    The declared output probes the merged sketch for the exact top-20
    users, pairing exact counts with the never-undercounting estimates.
    Scale: per-batch state is ≤ depth×width cells regardless of batch
    size; the sink grows linearly in batch COUNT and compacts on read —
    the bounded-state streaming summary shape."""
    from ..operators.heavyhitters import countmin_estimate

    merged = windows.stream_countmin_cells(spark, sf_dir, user_cap=100)
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    ex = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.desc("n_exact"), "user_id")
        .limit(20)
    )
    est = countmin_estimate(merged, ex.select("user_id"), "user_id")
    return ex.join(est, "user_id").select("user_id", "n_exact", "n_est")


@query(
    "t20_stream_versioned_commits",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS id_checksum,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE user_id < 80
    """,
    tags=("T1", "S8", "S18"),
)
def t20_stream_versioned_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a VERSIONED table: each non-empty
    micro-batch of a rate-limited file stream lands as one atomic
    append COMMIT of operators/versioned.VersionedTable (manifest
    published last — a crash mid-batch leaves the table at the previous
    version), so downstream readers pin a snapshot instead of racing
    the stream and any historical version stays time-travelable. The
    declared output fingerprints the LATEST version, which equals the
    whole feed no matter how the stream was batched (append-commit
    union is batching-independent, the t19 argument); the per-version
    history — monotone growth, version count ≥ 2, mid-stream time
    travel — is pytest-gated on the registered builder
    (tests/test_streaming_multibatch.py)."""
    table = windows.stream_versioned_commits(spark, sf_dir, user_cap=80)
    return table.read().agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("event_id").cast("long").alias("id_checksum"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@query(
    "t21_stream_merge_upsert",
    oracle="""
    WITH latest AS (
      SELECT user_id, max(event_id) AS event_id
      FROM events WHERE user_id < 60 GROUP BY user_id)
    SELECT l.user_id, l.event_id, e.event_type
    FROM latest l JOIN events e
      ON e.user_id = l.user_id AND e.event_id = l.event_id
    """,
    tags=("T1", "S25", "CDC2"),
)
def t21_stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MERGE into the versioned table
    (streaming/windows.stream_merge_upserts): each micro-batch reduces
    to its per-user latest record and merges with ``WHEN MATCHED AND
    s.event_id > t.event_id THEN UPDATE SET * / WHEN NOT MATCHED INSERT
    *`` — Delta's foreachBatch-MERGE recipe, the UPDATE-capable
    completion of t2's insert-only streaming upsert. The conditional
    rule makes the drained state batching-independent (a row is only
    ever replaced by a larger event_id), so the oracle restates it as a
    plain per-user argmax over the source feed with NO assumption about
    file/batch order — a green hash certifies the whole loop: per-batch
    dedup, conditional replace, insert, and the per-commit
    expected-base pin. Scale: per batch one merge-key shuffle over
    |table| + |batch| (copy-on-write; Delta's file-pruned merge is the
    refinement), state bounded by distinct keys, not stream length."""
    table = windows.stream_merge_upserts(spark, sf_dir, user_cap=60)
    return table.read().select("user_id", "event_id", "event_type")


@query(
    "t22_versioned_stream_source",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM events WHERE user_id < 50
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("T22", "T1", "S32", "S20"),
)
def t22_versioned_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SOURCE over the versioned table's commit log
    (sources/versioned_stream.VersionedTableStreamSource — Delta's
    ``readStream.format("delta")`` in miniature; completes the lakehouse
    streaming loop whose sink half is t20/t21): offsets ARE version
    numbers, each micro-batch replays exactly the batch dirs its commit
    range APPENDED (manifest set-difference — driver does pure metadata,
    one InputPartition per added parquet file, executors stream Arrow
    RecordBatches; no per-row Python, no driver data). The feed is three
    append commits with a merge-on-read DELETE wedged in; paced at one
    commit per micro-batch, ``ignoreChanges=true`` SKIPS the DV commit
    (a visible-row change with no new dirs has no append delta — Delta's
    exact streaming contract, raise-unless-opted-out pytest-gated). The
    drained union is batching- and delete-independent — immutable files
    + manifest set-difference make replay deterministic — so the oracle
    is a plain batch restatement of the capped feed. The engine also
    asserts the pacing was real (≥3 non-empty micro-batches)."""
    from ..streaming import windows

    drained, n_batches = windows.stream_versioned_source_replay(
        spark, sf_dir, user_cap=50
    )
    if n_batches < 3:
        raise AssertionError(
            f"paced commit-log replay must take >=3 micro-batches, got "
            f"{n_batches}"
        )
    return (
        drained.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


@query(
    "t23_stream_change_feed",
    oracle="""
    WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 4 <> 0),
    s AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
          ORDER BY o_orderkey LIMIT 20),
    d AS (SELECT o_orderkey FROM orders
          WHERE o_orderkey % 131 = 0 AND o_orderkey % 4 <> 0
          ORDER BY o_orderkey LIMIT 10),
    p AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 1000 = 0)
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS commit_version, 'insert' AS change_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
      FROM a HAVING count(*) > 0
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'update', CAST(count(*) AS BIGINT),
             CAST(sum(o_orderkey) AS BIGINT)
      FROM s WHERE o_orderkey % 4 <> 0 HAVING count(*) > 0
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'insert', CAST(count(*) AS BIGINT),
             CAST(sum(o_orderkey) AS BIGINT)
      FROM s WHERE o_orderkey % 4 = 0 HAVING count(*) > 0
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'delete', CAST(count(*) AS BIGINT),
             CAST(sum(o_orderkey) AS BIGINT)
      FROM d HAVING count(*) > 0
      UNION ALL
      SELECT CAST(4 AS BIGINT), 'insert', CAST(count(*) AS BIGINT),
             CAST(sum(o_orderkey) AS BIGINT)
      FROM p HAVING count(*) > 0
    ) ORDER BY commit_version, change_type
    """,
    tags=("T23", "S44", "S23", "T22", "S28"),
)
def t23_stream_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ROW-LEVEL CHANGE FEED (t23 — Delta's streaming
    ``readChangeFeed``; `sources/versioned_stream.
    VersionedCDFStreamSource` + the CDF materialization in
    `operators/versioned`): the r11 verdict's item 4, completing the
    replication story as a STREAM. Row-changing commits (MERGE, DELETE)
    on a feed-enabled table stage their change rows — full rows +
    ``_change_type`` — in the SAME atomic manifest write as the commit
    (``#cdf=`` header), so following a 100 TB table costs O(changed
    rows) per commit with no snapshot diffs; pure appends stream as
    synthesized inserts from their added files (no cdf written —
    Delta's cost model). History here: v1 append (keys %4≠0), v2 MERGE
    (20 smallest %97 keys → updates where present, inserts where not),
    v3 bucket-granular DELETE (10 smallest present %131 keys), v4
    append (%1000 keys). The feed is drained PACED at one commit per
    micro-batch (engine asserts ≥4 real batches) and aggregated per
    (commit_version, change_type); the oracle restates every leg
    set-theoretically — a missed update/insert split, phantom delete,
    or double-delivered batch hash-fails. Checkpoint-restart
    exactly-once and the vacuumed-history refusal are pytest-gated in
    tests/test_round12_cdf.py."""
    import os as _os

    from ..io import scratch_dir
    from ..operators.versioned import (
        VersionedTable,
        delete_by_keys,
        merge_upsert,
    )
    from ..streaming import windows

    # the projection is sliced four ways below (append/merge/delete/
    # append): materialize once instead of re-scanning orders per slice
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .localCheckpoint()
    )
    t = VersionedTable(spark, _os.path.join(scratch_dir("vcdf_"), "orders_v"))
    t.enable_change_data_feed()
    t.set_layout(["o_orderkey"], 32)
    t.commit(o.filter(F.col("o_orderkey") % 4 != 0))
    merge_upsert(
        t,
        o.filter(F.col("o_orderkey") % 97 == 0)
        .orderBy("o_orderkey")
        .limit(20)
        .withColumn("o_orderstatus", F.lit("B")),
        keys=["o_orderkey"],
    )
    delete_by_keys(
        t,
        o.filter(
            (F.col("o_orderkey") % 131 == 0) & (F.col("o_orderkey") % 4 != 0)
        )
        .orderBy("o_orderkey")
        .limit(10)
        .select("o_orderkey"),
        keys=["o_orderkey"],
    )
    t.commit(o.filter(F.col("o_orderkey") % 1000 == 0), mode="append")
    feed, n_batches = windows.drain_versioned_cdf(spark, t, per_batch=1)
    if n_batches < 4:
        raise AssertionError(
            f"paced change-feed replay must take >=4 micro-batches, got "
            f"{n_batches}"
        )
    return (
        feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        )
        .orderBy("commit_version", "change_type")
    )


@query(
    "t24_stream_versioned_sink",
    oracle="""
    WITH seq AS (SELECT unnest(generate_series(0, 299)) AS i),
    feed AS (
      SELECT (i % 2) AS station_id, (i // 2) AS obs_seq,
             ((i % 2) * 1000003 + (i // 2) * 7919) % 60000 - 20000 AS temp_c_milli,
             ['N','NE','E','SE','S','SW','W','NW'][((i % 2) + (i // 2)) % 8 + 1]
                 AS wind_dir
      FROM seq)
    SELECT wind_dir,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(temp_c_milli) AS BIGINT) AS sum_temp,
           CAST(min(obs_seq) AS BIGINT) AS first_seq
    FROM feed GROUP BY wind_dir
    ORDER BY wind_dir
    """,
    tags=("T24", "T20", "S49", "T15", "S45"),
)
def t24_stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vanilla STREAMING sink over the versioned format
    (`sources/versioned_sink.VersionedTableStreamWriter` —
    ``df.writeStream.format("versioned_table")``, round-13 T24): every
    non-empty micro-batch lands as one atomic append COMMIT through the
    same staging/CAS/rebase machinery as the S49 batch sink, closing
    the vanilla lakehouse streaming loop (readStream t22/t23 +
    writeStream, zero library imports). Exactly-once against
    foreachBatch-style redelivery rides an ``#sbatch=`` micro-batch-id
    header on the commit CAS (replayed ids no-op — engine-asserted in
    tests/test_round13_stream_sink.py along with a mid-stream
    checkpoint restart). Here: the closed-form station feed (2 stations
    x 150 obs) drains availableNow into a versioned table; the engine
    asserts the commit op is ``stream append`` and the declared output
    re-reads the table through the VANILLA batch reader (S45) and
    aggregates per wind direction; the oracle regenerates the feed from
    generate_series. The reference's poll-transform-insert loop
    (airflow/dags/weather_etl.py:25-32,158-187) is exactly this shape:
    stream in, commit atomically, query the table."""
    import os as _os
    import uuid as _uuid

    from ..operators.versioned import VersionedTable
    from ..sources import pyds, versioned_stream

    pyds.register(spark)
    versioned_stream.register(spark)
    root = scratch_dir("vssink_")
    tdir = _os.path.join(root, f"obs_{_uuid.uuid4().hex[:8]}")
    q = (
        spark.readStream.format("weather_feed_stream")
        .option("stations", "2")
        .option("obs_per_station", "150")
        .load()
        .writeStream.format("versioned_table")
        .option("tableDir", tdir)
        .option("checkpointLocation", _os.path.join(root, f"ck_{_uuid.uuid4().hex[:8]}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(240):
        q.stop()
        raise TimeoutError("t24 stream drain did not finish in 240s")
    t = VersionedTable(spark, tdir)
    ops = {h.get("op") for h in t.history()}
    if ops != {"stream append"}:
        raise AssertionError(f"unexpected commit ops from the stream sink: {ops}")
    table = (
        spark.read.format("versioned_table").option("tableDir", tdir).load()
    )
    return (
        table.groupBy("wind_dir")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum("temp_c_milli").alias("sum_temp"),
            F.min("obs_seq").alias("first_seq"),
        )
        .orderBy("wind_dir")
    )
