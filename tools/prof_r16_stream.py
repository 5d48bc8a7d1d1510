"""Round-16 profiling: where do t23/t22 walls go — fixture build vs
drain, and inside the drain, the engine's per-batch durationMs split."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def prof_t23(spark):
    import os as _os

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        VersionedTable,
        delete_by_keys,
        merge_upsert,
    )
    from weather_etl_docker_airflow_project_spark.streaming import windows

    t0 = time.time()
    o = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus")
        .localCheckpoint()
    )
    t1 = time.time()
    t = VersionedTable(spark, _os.path.join(scratch_dir("vcdf_"), "orders_v"))
    t.enable_change_data_feed()
    t.set_layout(["o_orderkey"], 32)
    t.commit(o.filter(F.col("o_orderkey") % 4 != 0))
    t2 = time.time()
    merge_upsert(
        t,
        o.filter(F.col("o_orderkey") % 97 == 0)
        .orderBy("o_orderkey")
        .limit(20)
        .withColumn("o_orderstatus", F.lit("B")),
        keys=["o_orderkey"],
    )
    t3 = time.time()
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
    t4 = time.time()
    t.commit(o.filter(F.col("o_orderkey") % 1000 == 0), mode="append")
    t5 = time.time()
    feed, n_batches = windows.drain_versioned_cdf(spark, t, per_batch=1)
    t6 = time.time()
    rows = (
        feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        )
        .orderBy("commit_version", "change_type")
        .count()
    )
    t7 = time.time()
    print(
        f"t23: ckpt={t1-t0:.2f} commit1={t2-t1:.2f} merge={t3-t2:.2f} "
        f"delete={t4-t3:.2f} commit4={t5-t4:.2f} drain={t6-t5:.2f} "
        f"agg={t7-t6:.2f} total={t7-t0:.2f} batches={n_batches} rows={rows}"
    )


def prof_t22(spark):
    from weather_etl_docker_airflow_project_spark.streaming import windows

    t0 = time.time()
    drained, n_batches = windows.stream_versioned_source_replay(
        spark, SF_DIR, user_cap=50
    )
    t1 = time.time()
    n = (
        drained.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .orderBy("event_type")
        .count()
    )
    t2 = time.time()
    print(f"t22: build+drain={t1-t0:.2f} agg={t2-t1:.2f} batches={n_batches} n={n}")


def drain_with_progress(spark, table, per_batch, fmt):
    """Copy of drain loop that dumps recentProgress durationMs."""
    import tempfile
    import uuid

    from weather_etl_docker_airflow_project_spark.sources import versioned_stream

    versioned_stream.register(spark)
    target = table.versions()[-1]
    name = f"vsrc_{uuid.uuid4().hex}"
    ckpt = os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "ck")
    stream = (
        spark.readStream.format(fmt)
        .option("tableDir", table.dir)
        .option("startingVersion", "0")
        .option("ignoreChanges", "false")
        .option("maxVersionsPerBatch", str(per_batch))
        .option("maxFilesPerBatch", "0")
        .option("paceStateDir", os.path.join(ckpt, "pace"))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        lp = q.lastProgress
        if lp and lp.get("sources"):
            eo = lp["sources"][0].get("endOffset")
            if eo is not None:
                if isinstance(eo, str):
                    import ast

                    try:
                        eo = json.loads(eo)
                    except ValueError:
                        eo = ast.literal_eval(eo)
                if eo["version"] >= target:
                    break
        if q.exception() is not None:
            raise q.exception()
        time.sleep(0.05)
    for p in q.recentProgress:
        print(
            "  batch", p.get("batchId"), "rows", p.get("numInputRows"),
            "durationMs", p.get("durationMs"),
        )
    q.stop()
    q.awaitTermination(60)


def prof_t23_drain_detail(spark):
    import os as _os

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        VersionedTable,
        delete_by_keys,
        merge_upsert,
    )

    o = (
        load_table(spark, SF_DIR, "orders")
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
    print("t23 drain per-batch detail:")
    t0 = time.time()
    drain_with_progress(spark, t, 1, "versioned_cdf_stream")
    print(f"  drain wall={time.time()-t0:.2f}")


def main():
    spark = build_session(app_name="prof-r16")
    # warm
    spark.range(1000).groupBy().count().collect()
    which = sys.argv[1:] or ["t23", "t23", "t22", "t22", "detail"]
    for w in which:
        if w == "t23":
            prof_t23(spark)
        elif w == "t22":
            prof_t22(spark)
        elif w == "detail":
            prof_t23_drain_detail(spark)
    spark.stop()


if __name__ == "__main__":
    main()
