"""Round-12 decade measurements: scoped OPTIMIZE, DV-at-scale, CDF
overhead, and auto-rebase cost.

Part A — the four new queries (s41 incremental optimize, s42 clustered
bucket table, s43 concurrent writers, t23 streaming change feed) timed
at a given sf_dir with the bench calibration probe (SCALE.md subset
protocol).

Part B — the design claims isolated from fixture building:

1. FULL vs INCREMENTAL OPTIMIZE: cluster a versioned orders table, then
   append a CONSTANT-size delta (50k rows) and re-OPTIMIZE
   incrementally. The full rewrite's wall grows with the table; the
   incremental wall tracks the delta — the difference is what makes
   OPTIMIZE runnable at 100 TB (the r11 verdict's `weak`).
2. READ WITH A 10^6-KEY DELETION VECTOR: scattered merge-on-read delete
   of ~1M keys, then a full-snapshot aggregate through the DV
   anti-join. Asserts the physical plan BROADCASTS the DV (one
   map-side pass, no data-side shuffle) and reports the wall vs the
   DV-free read — the S32 key-set contract, measured.
3. CDF STAGING OVERHEAD: the same constant-size merge (1k keys) with
   the change data feed off vs on. The delta is the feed's write cost —
   O(changes), flat in table size.
4. AUTO-REBASE vs CALLER RETRY: a merge that loses its CAS race to a
   disjoint-bucket interloper. r11 behavior = exception + full re-run
   (~2x merge wall); r12 rebase = one merge wall + metadata. Reported
   as (merge alone, merge with interloper rebase).

Usage: python tools/measure_round12_sf.py [sf_dir]
(default /root/testdata/sf0.1; pass .scratch/sf1 / .scratch/sf3)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir  # noqa: E402
from weather_etl_docker_airflow_project_spark.operators.versioned import (  # noqa: E402
    VersionedTable,
    cluster_rewrite,
    delete_by_keys,
    merge_upsert,
)
from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

QUERIES = [
    "s41_incremental_optimize",
    "s42_clustered_bucket_table",
    "s43_concurrent_writers",
    "t23_stream_change_feed",
]


def _calibration(spark) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(200_000_000).select(
            F.xxhash64("id").alias("h")
        ).agg(F.max("h")).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="measure-r12", shuffle_partitions=32)
    cal = _calibration(spark)
    out = {"sf_dir": sf_dir, "calibration": round(cal, 3)}

    # Part A: the four queries
    q = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            catalog.REGISTRY[name].fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        q[name] = round(best, 2)
    out["queries"] = q

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n_orders = o.count()
    out["n_orders"] = n_orders

    # B1: full vs incremental OPTIMIZE (constant 50k-row delta)
    t = VersionedTable(spark, os.path.join(scratch_dir("m12opt_"), "t"))
    t.set_stats_columns(["o_totalprice"])
    t.commit(o)
    t0 = time.time()
    cluster_rewrite(t, ["o_totalprice"], n_chunks=16, bits=6)
    full_wall = time.time() - t0
    delta = o.orderBy("o_orderkey").limit(50_000).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    t.commit(delta, mode="append")
    t0 = time.time()
    cluster_rewrite(t, ["o_totalprice"], n_chunks=2, bits=6, incremental=True)
    incr_wall = time.time() - t0
    out["optimize"] = {
        "full_wall": round(full_wall, 2),
        "incremental_wall_50k_delta": round(incr_wall, 2),
    }

    # B2: read through a ~1M-key deletion vector, broadcast-asserted
    t2 = VersionedTable(spark, os.path.join(scratch_dir("m12dv_"), "t"))
    t2.commit(o)
    dv_keys = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    n_dv = dv_keys.count()
    delete_by_keys(t2, dv_keys, keys=["o_orderkey"], merge_on_read=True)
    plan = t2.read()._jdf.queryExecution().executedPlan().toString()
    broadcast_antijoin = (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ) or ("BroadcastNestedLoopJoin" not in plan and "Broadcast" in plan)
    t0 = time.time()
    n_after = t2.read().agg(F.count(F.lit(1))).first()[0]
    dv_read = time.time() - t0
    t0 = time.time()
    t2.read(version=1).agg(F.count(F.lit(1))).first()
    base_read = time.time() - t0
    out["dv_read"] = {
        "n_dv_keys": n_dv,
        "rows_after": n_after,
        "broadcast_antijoin": bool(broadcast_antijoin),
        "read_with_dv_wall": round(dv_read, 2),
        "read_without_dv_wall": round(base_read, 2),
    }

    # B3: CDF staging overhead on a constant-size merge (1k keys)
    src = (
        o.orderBy("o_orderkey")
        .limit(1000)
        .withColumn("o_orderstatus", F.lit("Z"))
    )
    walls = {}
    for label, enable in (("cdf_off", False), ("cdf_on", True)):
        tt = VersionedTable(
            spark, os.path.join(scratch_dir(f"m12cdf_{label}_"), "t")
        )
        if enable:
            tt.enable_change_data_feed()
        tt.set_layout(["o_orderkey"], 64)
        tt.commit(o)
        t0 = time.time()
        merge_upsert(tt, src, keys=["o_orderkey"])
        walls[label] = round(time.time() - t0, 2)
    out["cdf_merge_1k"] = walls

    # B5: predicate UPDATE — stats-scoped vs unscoped (constant-size
    # scope: a 50k-row sentinel batch outside the data's date range)
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        update_where,
    )

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    import datetime as _dt

    date_t = dict(od.dtypes)["o_orderdate"]
    sentinel = (
        od.orderBy("o_orderkey")
        .limit(50_000)
        .withColumn(
            "o_orderdate", F.lit(_dt.datetime(2030, 1, 1)).cast(date_t)
        )
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10**9))
    )
    upd_walls = {}
    for label, with_stats in (("scoped", True), ("unscoped", False)):
        tu = VersionedTable(
            spark, os.path.join(scratch_dir(f"m12upd_{label}_"), "t")
        )
        if with_stats:
            tu.set_stats_columns(["o_orderdate"])
        tu.commit(od)
        tu.commit(sentinel, mode="append")
        t0 = time.time()
        update_where(
            tu,
            {"o_orderstatus": "'U'"},
            [("o_orderdate", ">=", _dt.datetime(2029, 1, 1))],
        )
        upd_walls[label] = round(time.time() - t0, 2)
    out["update_where_50k_scope"] = upd_walls

    # B6: incremental vs full compaction of a constant 20-drip fragment
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        compact,
        compact_incremental,
    )

    cmp_walls = {}
    for label in ("incremental", "full"):
        tc = VersionedTable(
            spark, os.path.join(scratch_dir(f"m12cmp_{label}_"), "t")
        )
        tc.commit(o.coalesce(max(1, n_orders // 500_000)))
        drip = o.orderBy("o_orderkey").limit(20).collect()
        for i, r in enumerate(drip):
            tc.commit(
                spark.createDataFrame([r], o.schema).coalesce(1).withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit((i + 1) * 10**9)
                ),
                mode="append",
            )
        t0 = time.time()
        if label == "incremental":
            compact_incremental(tc, min_dir_bytes=16 * 1024)
        else:
            compact(tc)
        cmp_walls[label] = round(time.time() - t0, 2)
    out["compact_20_drips"] = cmp_walls

    # B4: auto-rebase cost vs a clean merge
    t3 = VersionedTable(spark, os.path.join(scratch_dir("m12reb_"), "t"))
    t3.set_layout(["o_orderkey"], 64)
    t3.commit(o)
    src_a = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .orderBy("o_orderkey")
        .limit(10)
        .withColumn("o_orderstatus", F.lit("A"))
    )
    t0 = time.time()
    merge_upsert(t3, src_a, keys=["o_orderkey"])
    clean_wall = time.time() - t0
    # race a DISJOINT interloper between base read and publish
    other = VersionedTable(spark, t3.dir)
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        _bucket_column,
    )

    probe = (
        o.filter(F.col("o_orderkey") % 101 == 0)
        .limit(200)
        .withColumn("b", _bucket_column(["o_orderkey"], 64))
    )
    a_bkts = {
        r.b
        for r in src_a.select(
            _bucket_column(["o_orderkey"], 64).alias("b")
        ).collect()
    }
    diff_keys = [r.o_orderkey for r in probe.collect() if r.b not in a_bkts][
        :10
    ]
    src_b = o.filter(F.col("o_orderkey").isin(diff_keys)).withColumn(
        "o_orderstatus", F.lit("B")
    )
    real_read = t3.read

    def read_once(version=None):
        t3.read = real_read
        merge_upsert(other, src_b, keys=["o_orderkey"])
        return real_read(version=version)

    t3.read = read_once
    t0 = time.time()
    merge_upsert(t3, src_a, keys=["o_orderkey"])  # rebases
    raced_wall = time.time() - t0
    out["rebase"] = {
        "clean_merge_wall": round(clean_wall, 2),
        "raced_merge_wall_incl_interloper": round(raced_wall, 2),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
