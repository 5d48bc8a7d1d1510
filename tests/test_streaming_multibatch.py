"""Gate for t17: the rate-limited file stream must actually process
MULTIPLE micro-batches under availableNow (one per file), and the final
complete-mode snapshot must equal the batch aggregate regardless of the
batching. Drives the REGISTERED builder (windows.multibatch_event_agg —
the same construction t17_stream_multibatch drains), so a regression in
the query's rate limit or file split fails here."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir
from weather_etl_docker_airflow_project_spark.streaming import windows


def test_available_now_honors_max_files_per_trigger(spark):
    sf = "/root/testdata/sf0.001"
    agg = windows.multibatch_event_agg(spark, sf, user_cap=50)
    name = f"mb_{uuid.uuid4().hex}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(scratch_dir("mb_ck"), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 5  # one micro-batch per file, not one big drain
    got = {
        r["event_type"]: (r["n"], r["id_checksum"])
        for r in spark.table(name).collect()
    }
    base = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    want = {
        r["event_type"]: (r["n"], r["chk"])
        for r in base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("chk"),
        )
        .collect()
    }
    assert got == want


def test_stream_countmin_is_batching_independent(spark, tmp_path):
    """T19 gate on the REGISTERED builder: the drain must run multiple
    real micro-batches (raw cell sink holds more than one partial
    sketch) and the merged sketch must be row-identical to a one-shot
    batch sketch of the same feed — CMS merge is addition, so batching
    cannot change the result."""
    import os

    from pyspark.sql import functions as F

    from weather_etl_docker_airflow_project_spark.io import load_table
    from weather_etl_docker_airflow_project_spark.operators.heavyhitters import (
        countmin_sketch,
    )
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        stream_countmin_cells,
    )

    sf = "/root/testdata/sf0.001"
    base = str(tmp_path / "cm")
    merged = stream_countmin_cells(spark, sf, user_cap=100, base_dir=base)
    raw = spark.read.parquet(os.path.join(base, "cells"))
    one_shot = countmin_sketch(
        load_table(spark, sf, "events").filter(F.col("user_id") < 100).select("user_id"),
        "user_id",
    )
    assert raw.count() > merged.count()  # >1 partial appended -> real multi-batch
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in one_shot.collect()
    }


def test_stream_countmin_refuses_reused_base_dir(spark, tmp_path):
    import pytest as _pytest

    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        stream_countmin_cells,
    )

    base = str(tmp_path / "cm")
    stream_countmin_cells(spark, "/root/testdata/sf0.001", user_cap=50, base_dir=base)
    with _pytest.raises(ValueError, match="fresh base_dir"):
        stream_countmin_cells(spark, "/root/testdata/sf0.001", user_cap=50, base_dir=base)


def test_stream_versioned_commits_history(spark, tmp_path):
    """T20 gate on the REGISTERED builder: the drain must mint one
    version per non-empty micro-batch (>= 2), versions grow
    monotonically under append lineage, mid-stream time travel works,
    and the latest version equals the whole feed."""
    from pyspark.sql import functions as F

    from weather_etl_docker_airflow_project_spark.io import load_table
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        stream_versioned_commits,
    )

    sf = "/root/testdata/sf0.001"
    t = stream_versioned_commits(spark, sf, user_cap=80, base_dir=str(tmp_path / "v"))
    vs = t.versions()
    assert len(vs) >= 2
    counts = [t.read(v).count() for v in vs]
    assert counts == sorted(counts) and counts[0] < counts[-1]
    feed = load_table(spark, sf, "events").filter(F.col("user_id") < 80)
    assert counts[-1] == feed.count()
    # mid-stream snapshot is a strict prefix of the feed's rows
    mid = {r["event_id"] for r in t.read(vs[0]).select("event_id").collect()}
    all_ids = {r["event_id"] for r in feed.select("event_id").collect()}
    assert mid < all_ids
