"""Round-13 gates: streaming rate limiting by FILES
(``maxFilesPerBatch`` on the t22/t23 sources — r12 verdict item 6).
The old ``maxVersionsPerBatch`` paces by commit count, so one huge
commit still lands in a single micro-batch; file pacing carries a
``files`` cursor in the offset so a commit's (fully sorted, immutable)
file list SPLITS across batches, and a checkpoint restart resumes
mid-commit exactly once."""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
)
from weather_etl_docker_airflow_project_spark.streaming.windows import (
    drain_versioned_source,
)


def _table(spark, tmp_path):
    """v1 = one LARGE commit (8 files of exactly 10 rows — a union of
    single-partition ranges keeps partition boundaries), v2..v4 = one
    file each."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    # exactly 8 partitions of 10 rows: RDD slicing is deterministic and
    # neither Catalyst (union/repartition collapsing) nor AQE rewrites
    # a non-shuffle write's partitioning
    big = spark.createDataFrame(
        spark.sparkContext.parallelize([(i,) for i in range(80)], 8),
        "k bigint",
    )
    t.commit(big)
    for i in range(3):
        t.commit(
            spark.range(80 + i * 10, 90 + i * 10)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            mode="append",
        )
    return t


def test_file_paced_drain_splits_large_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    drained, n_batches = drain_versioned_source(
        spark, t, per_batch=0, max_files_per_batch=3
    )
    # 11 files total -> ceil(11/3) = 4 non-empty batches; the 8-file
    # commit alone spans 3 of them
    assert n_batches == 4
    assert sorted(r.k for r in drained.collect()) == list(range(110))


def test_file_and_version_pacing_compose(spark, tmp_path):
    t = _table(spark, tmp_path)
    # version cap 1 + file cap 5: the big commit splits 5+3, then the
    # singles go one per batch (version-capped)
    drained, n_batches = drain_versioned_source(
        spark, t, per_batch=1, max_files_per_batch=5
    )
    assert n_batches == 5
    assert drained.count() == 110


def test_file_paced_batch_sizes_are_capped(spark, tmp_path):
    """Assert the per-batch input sizes, not just the batch count."""
    from weather_etl_docker_airflow_project_spark.sources import (
        versioned_stream,
    )

    t = _table(spark, tmp_path)
    versioned_stream.register(spark)
    name = f"fp_{uuid.uuid4().hex}"
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("versioned_table_stream")
        .option("tableDir", t.dir)
        .option("maxFilesPerBatch", "3")
        .option("paceStateDir", os.path.join(ck, "pace"))
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= 110:
                break
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.2)
        sizes = [
            p["numInputRows"]
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        q.stop()
    # every file holds 10 rows; 3-file cap -> every batch <= 30 rows,
    # and the schedule is deterministic: 30,30,30,20
    assert sizes == [30, 30, 30, 20], sizes
    assert spark.table(name).count() == 110


def test_file_paced_restart_resumes_mid_commit_exactly_once(spark, tmp_path):
    """Stop after the FIRST file-paced batch (mid-way through the large
    commit) and restart from the same checkpoint: every row lands
    exactly once — the split-commit offset is stable across restarts."""
    from weather_etl_docker_airflow_project_spark.sources import (
        versioned_stream,
    )

    t = _table(spark, tmp_path)
    versioned_stream.register(spark)
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def _start():
        return (
            spark.readStream.format("versioned_table_stream")
            .option("tableDir", t.dir)
            .option("maxFilesPerBatch", "3")
            .option("paceStateDir", os.path.join(ck, "pace"))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = _start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(
                p.get("numInputRows", 0) > 0 for p in q.recentProgress
            ):
                break
            time.sleep(0.1)
    finally:
        q.stop()
    q.awaitTermination(60)
    # offset is mid-commit now (3 of 8 files of v1); restart and drain
    q2 = _start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            lp = q2.lastProgress
            if lp and lp.get("sources"):
                eo = lp["sources"][0].get("endOffset")
                if eo:
                    if isinstance(eo, str):
                        try:
                            eo = json.loads(eo)
                        except ValueError:
                            import ast

                            eo = ast.literal_eval(eo)
                    if eo["version"] >= 4 and eo.get("files", 0) == 0:
                        break
            if q2.exception() is not None:
                raise q2.exception()
            time.sleep(0.2)
    finally:
        q2.stop()
    q2.awaitTermination(60)
    got = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got == list(range(110))  # no dupes, no gaps


def test_file_paced_cdf_stream(spark, tmp_path):
    """The t23 change-feed source paces by files too: a large append's
    insert files split across batches with full offset/restart safety
    left to the shared machinery."""
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        drain_versioned_cdf,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.commit(spark.range(0, 60).select(F.col("id").alias("k")).repartition(6))
    feed, n_batches = drain_versioned_cdf(
        spark, t, per_batch=0, max_files_per_batch=2
    )
    assert n_batches == 3
    assert feed.count() == 60
    assert {r._change_type for r in feed.collect()} == {"insert"}


def test_unpaced_offsets_unchanged_for_existing_checkpoints(spark, tmp_path):
    """A pre-r13 checkpoint's offsets carry no ``files`` key; the source
    must keep accepting them (decode as files=0)."""
    t = _table(spark, tmp_path)
    from weather_etl_docker_airflow_project_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    reader = VersionedTableStreamReader(
        t.snapshot_schema(4), {"tabledir": t.dir}
    )
    parts = reader.partitions({"version": 1}, {"version": 4})
    assert len(parts) == 3  # the three single-file appends
