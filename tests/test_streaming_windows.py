"""Event-time semantics on crafted streams (streaming/windows.py):
genuine late-data dropping across micro-batches (T4) — the one behavior
the single-batch oracle queries cannot show.

Spark's watermark is a lower-bound GUARANTEE, not an eager filter: a late
row arriving while its window state is still live may be included
(best-effort). The drop is guaranteed once the state was emitted and
evicted — so the fixture interposes a batch between the watermark advance
and the late arrival."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.streaming import windows


def _land(dirpath: str, name: str, rows: list[dict], mtime: int) -> None:
    os.makedirs(dirpath, exist_ok=True)
    path = os.path.join(dirpath, name)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)
    os.utime(path, (mtime, mtime))  # file source orders by mod time


def test_late_rows_dropped_after_state_eviction(spark, tmp_path):
    """Batch 0 advances the watermark past the 09:00 window's end; batch 1
    triggers its emission + state eviction; the 09:00 straggler in batch 2
    is then guaranteed-dropped (and the window is never re-emitted)."""
    landing = str(tmp_path / "landing")
    base = 1_700_000_000
    _land(landing, "a.json", [
        {"id": 1, "ts": "2024-01-01 09:10:00"},
        {"id": 2, "ts": "2024-01-01 09:20:00"},
        {"id": 3, "ts": "2024-01-01 12:00:00"},   # watermark -> 11:50
    ], base)
    _land(landing, "b.json", [
        {"id": 9, "ts": "2024-01-01 12:05:00"},   # 09:00 window emitted+evicted
    ], base + 10)
    _land(landing, "c.json", [
        {"id": 4, "ts": "2024-01-01 09:00:00"},   # LATE: state gone -> dropped
        {"id": 6, "ts": "2024-01-01 23:00:00"},   # finalizes 12:00 window
    ], base + 20)

    stream = (
        spark.readStream.schema("id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(landing)
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    out = windows.run_available_now(stream)
    counts = {str(r["start"]): r["n"] for r in out.collect()}
    # the late id=4 neither lands in the emitted window nor re-emits it
    assert counts.get("2024-01-01 09:00:00") == 2
    assert counts.get("2024-01-01 12:00:00") == 2
    assert len([s for s in counts if s.startswith("2024-01-01 09:")]) == 1
