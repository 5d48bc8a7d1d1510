"""SparkSession factory.

The reference converts epoch seconds to UTC wall-clock strings
(``airflow/dags/weather_etl.py:119,129-130``); to reproduce that with
``F.timestamp_seconds`` + ``F.date_format`` the session timezone MUST be
UTC (SURVEY.md §2.8 F1/F3).

Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), shuffle partitions sized for the local harness but meant to be
overridden (``spark.sql.shuffle.partitions`` ~ 2-3x total cores on a real
cluster). Arrow enabled for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "weather-etl-spark-engine",
    master: str | None = None,
    shuffle_partitions: str | int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine.

    Every knob here is plain public Spark configuration; on a real cluster
    only ``master`` and the partition counts change.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        # UTC fidelity for the reference's timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime adaptivity: coalesce small shuffle partitions, split skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas_udf / applyInPandas / mapInPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) — read as long.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep broadcast joins available for dimension tables.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local[32] is driver == all 32 executor threads in ONE JVM: heap
        # must cover 32 concurrent task sort/hash buffers plus pinned
        # localCheckpoint blocks. 8g (the small-SF default through r8)
        # tipped over at the 30x decade scale — a long bench session's
        # accumulated checkpoints plus one 36M-edge orientation killed
        # the context. 32g is still a quarter of the host; a real
        # cluster splits this across executors and the number is per
        # -executor ordinary.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
