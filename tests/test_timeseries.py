"""Semantics tests for the batch time-series queries (plans/timeseries_q.py)
on crafted inputs: session-gap boundary behavior, grid densification, and
forward-fill — plus the plan property ts1 exists for (one shuffle total).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.plans import catalog


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, "e", 1.0, "{}") for i, (ts, uid) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _sessionize(spark, df):
    """Run the registered query's logic against a fixture table by writing
    it as the events view the query loads."""
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return catalog.REGISTRY["ts1_batch_sessionize"].fn(spark, d)


def test_sessionize_gap_boundary_is_strict(spark):
    """A gap of exactly 30:00.000000 does NOT break the session (strict >);
    one microsecond more does."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0, 1),
        (t0 + dt.timedelta(seconds=1800), 1),                      # exactly 30 min
        (t0 + dt.timedelta(seconds=3600, microseconds=1), 1),      # 30 min + 1 us
        (t0, 2),                                                    # other user
    ]
    out = _sessionize(spark, _mk_events(spark, rows)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["session_seq"])
    assert [r["n_events"] for r in u1] == [2, 1]
    assert u1[0]["session_start"] == t0
    assert u1[0]["session_end"] == t0 + dt.timedelta(seconds=1800)
    assert len(by_user[2]) == 1


def test_sessionize_single_shuffle_plan(spark):
    """The whole sessionize query — two window functions plus the final
    aggregate — must run off ONE hash exchange on user_id."""
    df = catalog.REGISTRY["ts1_batch_sessionize"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_gap_fill_densifies_and_carries(spark):
    """User with events in hours 0 and 3: the grid densifies hours 1-2 with
    n_events=0 and carries the hour-0 count forward until hour 3."""
    import tempfile

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0 + dt.timedelta(minutes=5), 1),
        (t0 + dt.timedelta(minutes=25), 1),
        (t0 + dt.timedelta(hours=3, minutes=1), 1),
    ]
    d = tempfile.mkdtemp()
    _mk_events(spark, rows).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r["hr"]: (r["n_events"], r["carried_n"])
        for r in catalog.REGISTRY["ts2_gap_fill_hourly"].fn(spark, d).collect()
    }
    hr = lambda h: t0 + dt.timedelta(hours=h)  # noqa: E731
    assert out == {
        hr(0): (2, 2),
        hr(1): (0, 2),
        hr(2): (0, 2),
        hr(3): (1, 1),
    }


def test_stats_suite_matches_plain_python(spark):
    """Sufficient-statistic derivation agrees with a direct two-pass
    computation on the same quantized inputs."""
    rows = (
        catalog.REGISTRY["a14_stats_suite"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    import math

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            "l_returnflag",
            F.floor("l_quantity").alias("x"),
            F.floor("l_extendedprice").alias("y"),
        )
        .collect()
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append((r["x"], r["y"]))
    for row in rows:
        xs, ys = zip(*groups[row["l_returnflag"]])
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        var = sum((x - mx) ** 2 for x in xs) / (n - 1)
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
        corr = cov / math.sqrt(
            (sum((x - mx) ** 2 for x in xs) / (n - 1))
            * (sum((y - my) ** 2 for y in ys) / (n - 1))
        )
        assert abs(row["var_x"] - var) < 1e-6 * max(1.0, abs(var))
        assert abs(row["cov_xy"] - cov) < 1e-6 * max(1.0, abs(cov))
        assert abs(row["corr_xy"] - corr) < 1e-9


def test_cumulative_distinct_counts_each_user_once(spark):
    """A user active on three days contributes to new_users only on their
    first day; cumulative_users is monotone and ends at the distinct
    total."""
    import tempfile

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (t0, 1), (t0 + dt.timedelta(days=1), 1), (t0 + dt.timedelta(days=2), 1),
        (t0 + dt.timedelta(days=1), 2),
        (t0 + dt.timedelta(days=2), 3),
    ]
    d = tempfile.mkdtemp()
    _mk_events(spark, rows).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = sorted(
        catalog.REGISTRY["ts4_cumulative_distinct_users"].fn(spark, d).collect(),
        key=lambda r: r["day"],
    )
    assert [(r["new_users"], r["cumulative_users"]) for r in out] == [
        (1, 1), (1, 2), (1, 3),
    ]


def test_retention_cohort_offsets(spark):
    """User first active in week 0 and returning in week 2 lands in
    (cohort_week, offset 0) and (cohort_week, offset 2), not offset 1."""
    import tempfile

    monday = dt.datetime(2024, 3, 4)  # a Monday
    rows = [
        (monday + dt.timedelta(days=1), 1),
        (monday + dt.timedelta(days=15), 1),   # two weeks later
        (monday + dt.timedelta(days=8), 2),    # cohort = week 1
    ]
    d = tempfile.mkdtemp()
    _mk_events(spark, rows).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in catalog.REGISTRY["ts5_weekly_retention_cohorts"].fn(spark, d).collect()
    }
    wk0 = monday
    wk1 = monday + dt.timedelta(days=7)
    assert out == {
        (wk0, 0): 1,
        (wk0, 2): 1,
        (wk1, 0): 1,
    }


def test_incremental_rollup_merges_additively(spark):
    """Applying batches incrementally equals the one-shot aggregate; an
    empty batch is a no-op; re-reading the sink reflects the last state."""
    import tempfile

    from weather_etl_docker_airflow_project_spark.operators.rollup import (
        maintain_rollup,
    )

    t0 = dt.datetime(2024, 5, 1)
    rows = [(t0 + dt.timedelta(hours=h), 1 + h % 2) for h in range(30)]
    events = _mk_events(spark, rows)
    sink = tempfile.mkdtemp(prefix="rollup_t_") + "/daily"
    for b in range(3):
        out = maintain_rollup(spark, sink, events.filter(F.col("event_id") % 3 == b))
    got = {(r["user_id"], r["day"]): (r["n_events"], r["sum_vfloor"])
           for r in out.collect()}
    want = {
        (r["user_id"], r["day"]): (r["n"], r["s"])
        for r in events.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(F.floor("value")).cast("long").alias("s")).collect()
    }
    assert got == want
    empty = events.filter(F.col("event_id") < 0)
    after = {(r["user_id"], r["day"]): (r["n_events"], r["sum_vfloor"])
             for r in maintain_rollup(spark, sink, empty).collect()}
    assert after == want


def test_max_concurrency_crafted_and_bruteforce(spark):
    """Distributed sweep gates: (a) hand-checked overlaps incl. touching
    intervals (half-open: end == next start is NOT concurrent) and
    intervals spanning multiple hour buckets (exercises the cross-bucket
    prefix offset); (b) randomized parity vs a brute-force sweep."""
    import datetime as dt
    import random

    from weather_etl_docker_airflow_project_spark.operators.sweep import (
        max_concurrency,
    )

    B = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(k, B + dt.timedelta(minutes=s), B + dt.timedelta(minutes=e))
             for k, s, e in rows],
            "k string, t_start timestamp, t_end timestamp",
        )

    crafted = [
        ("a", 0, 10), ("a", 5, 15), ("a", 9, 12),     # triple overlap at 9-10
        ("a", 15, 20),                                  # touches: not concurrent
        ("b", 0, 300), ("b", 100, 130), ("b", 110, 125),  # spans 5 hour buckets
        ("c", 0, 5),
    ]
    got = {
        r["k"]: (r["max_concurrent"], r["n_intervals"])
        for r in max_concurrency(mk(crafted), "k").collect()
    }
    assert got == {"a": (3, 4), "b": (3, 3), "c": (1, 1)}

    rng = random.Random(11)
    rows = [
        ("x", s, s + rng.randint(1, 400))
        for s in (rng.randint(0, 600) for _ in range(200))
    ]
    events = sorted(
        [(s, 1) for _, s, _ in rows] + [(e, -1) for _, _, e in rows]
    )  # (t, delta) with ends before starts at equal t
    c = best = 0
    for _, d in events:
        c += d
        best = max(best, c)
    got = max_concurrency(mk(rows), "k").collect()[0]
    assert (got["max_concurrent"], got["n_intervals"]) == (best, 200)


def test_two_pass_prefix_matches_single_window(spark):
    """The generic two-pass prefix must be row-identical to the textbook
    single ordered window — including bucket-boundary rows, an empty
    bucket in the middle of the range, and a bucket holding one row."""
    import random

    from pyspark.sql import Window
    from weather_etl_docker_airflow_project_spark.operators.sweep import (
        bucketed_row_number,
        two_pass_prefix,
    )

    rng = random.Random(7)
    # keys 0..199 with a hole at 80..119 (empty buckets mid-range)
    keys = [k for k in range(200) if not 80 <= k < 120]
    rows = [(k, rng.randint(1, 50)) for k in keys]
    df = spark.createDataFrame(rows, "k long, v long").withColumn(
        "bkt", (F.col("k") / 25).cast("int")
    )

    got = {
        r["k"]: (r["cum"], r["pos"])
        for r in bucketed_row_number(
            two_pass_prefix(df, "bkt", ["k"], "v", "cum"), "bkt", ["k"], "pos"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["cum"], r["pos"])
        for r in df.select(
            "k",
            F.sum("v").over(w).alias("cum"),
            F.row_number().over(Window.orderBy("k")).cast("long").alias("pos"),
        ).collect()
    }
    assert got == want


def test_grouped_weighted_median_bruteforce_and_edges(spark):
    """Bucketed weighted median vs a brute-force per-group scan; edge
    cases: all-equal values (degenerate min==max bucket range), a group
    with one row, and a heavy weight that pins the median early."""
    import random

    from weather_etl_docker_airflow_project_spark.operators.sweep import (
        grouped_weighted_median,
    )

    rng = random.Random(13)
    rows = []
    for i in range(300):  # group g: random values/weights
        rows.append(("g", rng.randint(0, 1000), rng.randint(1, 9), i))
    rows += [("eq", 42, 3, i) for i in range(5)]      # all-equal values
    rows += [("solo", 7, 1, 0)]                        # single row
    rows += [("heavy", 1, 100, 0), ("heavy", 2, 1, 1), ("heavy", 3, 1, 2)]

    def brute(grp):
        sub = sorted(
            [(v, w) for g, v, w, _ in rows if g == grp], key=lambda t: t[0]
        )
        tot = sum(w for _, w in sub)
        cum = 0
        for v, w in sub:
            cum += w
            if 2 * cum >= tot:
                return v
        raise AssertionError

    df = spark.createDataFrame(rows, "g string, v long, w long, tid long")
    typed = df.select(
        "g",
        F.col("v").cast("decimal(18,2)").alias("v"),
        F.col("w").cast("decimal(18,2)").alias("w"),
        "tid",
    )
    got = {
        r["g"]: int(r["weighted_median"])
        for r in grouped_weighted_median(typed, "g", "v", "w", ["tid"]).collect()
    }
    assert got == {g: brute(g) for g in ("g", "eq", "solo", "heavy")}
    assert got["heavy"] == 1 and got["eq"] == 42


def test_sequence_packing_bins_matches_global_cumsum(spark):
    """Distributed contiguous-fill packing vs the single-window cut it
    replaced — sparse negative-to-positive keys and an oversize doc."""
    from pyspark.sql import Window
    from weather_etl_docker_airflow_project_spark.operators.sampling import (
        sequence_packing_bins,
    )

    rows = [(k, 30 + (k * 7) % 60) for k in range(-50, 450, 3)]
    rows.append((997, 500))  # oversize: spills past capacity
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in sequence_packing_bins(df, "doc_id", "n_tokens", 100).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("n_tokens").over(w)
    want = {
        r["doc_id"]: r["bin_id"]
        for r in df.select(
            "doc_id",
            F.floor((cum - F.col("n_tokens")) / 100).cast("long").alias("bin_id"),
        ).collect()
    }
    assert got == want


def test_capped_running_sum_flush_semantics(spark):
    """Hand-checked fold: accumulator includes the triggering row, resets
    AFTER the flush, exact-cap hit flushes, per-key independence."""
    import datetime as dt

    from weather_etl_docker_airflow_project_spark.operators.sweep import (
        capped_running_sum,
    )

    B = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 40, 50, 30 -> flush at 120; then 90, 10 -> flush at 100 (exact)
        (1, 1, B + dt.timedelta(minutes=1), 40),
        (1, 2, B + dt.timedelta(minutes=2), 50),
        (1, 3, B + dt.timedelta(minutes=3), 30),
        (1, 4, B + dt.timedelta(minutes=4), 90),
        (1, 5, B + dt.timedelta(minutes=5), 10),
        # user 2: single oversized value flushes alone
        (2, 6, B + dt.timedelta(minutes=1), 250),
        (2, 7, B + dt.timedelta(minutes=2), 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, v long")
    got = {
        r["event_id"]: (r["acc_after"], r["flushed"])
        for r in capped_running_sum(df, "user_id", ["ts", "event_id"], "v", 100).collect()
    }
    assert got == {
        1: (40, False), 2: (90, False), 3: (120, True),
        4: (90, False), 5: (100, True),
        6: (250, True), 7: (5, False),
    }
