"""Checkpoint-restart gate: a streaming aggregation stopped mid-drain and
RESTARTED from the same checkpoint must resume from its offsets and reach
exactly the batch answer — no double counting (the redelivered first
files), no gaps (the unprocessed tail). This is the recovery half of the
exactly-once story the sinks' manifest tests cover from the output side."""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir


def test_restart_from_checkpoint_is_exactly_once(spark):
    sf = "/root/testdata/sf0.001"
    base = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    root = scratch_dir("restart")
    src = os.path.join(root, "files")
    ck = os.path.join(root, "ck")
    base.repartition(8).write.mode("overwrite").parquet(src)
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
    # phase 1: process a FEW micro-batches, then stop mid-stream
    q1 = (
        agg_stream().writeStream.format("memory")
        .queryName(name + "_p1")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .start()  # continuous trigger: keeps going until stopped
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [p for p in q1.recentProgress if p["numInputRows"] > 0]
        if len(done) >= 2:
            break
        time.sleep(0.5)
    q1.stop()
    q1.awaitTermination(60)
    assert any(p["numInputRows"] > 0 for p in q1.recentProgress)

    # phase 2: SAME checkpoint, fresh query — must resume, not replay
    q2 = (
        agg_stream().writeStream.format("memory")
        .queryName(name + "_p2")
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)

    got = {
        r["event_type"]: (r["n"], r["chk"])
        for r in spark.table(name + "_p2").collect()
    }
    want = {
        r["event_type"]: (r["n"], r["chk"])
        for r in base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("chk"),
        )
        .collect()
    }
    assert got == want  # no double counting, no gaps
