"""Checkpoint-restart gate: a streaming aggregation stopped mid-stream and
RESTARTED from the same checkpoint must resume from its committed offsets
and reach exactly the batch answer over EVERYTHING landed — no double
counting of files committed before the stop, no gaps. Robust to host
speed: phase 1 may drain any number of the initial files before stop
(throttled to 1/s so it can't finish instantly), and phase 2 is
guaranteed fresh work because new files land between the phases."""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir


def test_restart_from_checkpoint_is_exactly_once(spark):
    sf = "/root/testdata/sf0.001"
    base = load_table(spark, sf, "events")
    part1 = base.filter(F.col("user_id") < 40)
    part2 = base.filter((F.col("user_id") >= 40) & (F.col("user_id") < 80))
    root = scratch_dir("restart")
    src = os.path.join(root, "files")
    ck = os.path.join(root, "ck")
    part1.repartition(6).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def agg_stream():
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return s.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("chk"),
        )

    name = f"restart_{uuid.uuid4().hex}"
    # phase 1: throttled trigger so a fast host can't drain everything
    # before the stop; break as soon as at least one batch committed
    q1 = (
        agg_stream().writeStream.format("memory")
        .queryName(name + "_p1")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q1.recentProgress):
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    assert any(p["numInputRows"] > 0 for p in q1.recentProgress)

    # land NEW files between the phases: phase 2 always has unprocessed
    # work, whatever phase 1 managed to commit
    part2.repartition(3).write.mode("append").parquet(src)

    # phase 2: SAME checkpoint, fresh query — resumes, never replays
    q2 = (
        agg_stream().writeStream.format("memory")
        .queryName(name + "_p2")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)
    assert any(p["numInputRows"] > 0 for p in q2.recentProgress)

    got = {
        r["event_type"]: (r["n"], r["chk"])
        for r in spark.table(name + "_p2").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["chk"])
        for r in base.filter(F.col("user_id") < 80)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("chk"),
        )
        .collect()
    }
    assert got == want  # no double counting, no gaps
