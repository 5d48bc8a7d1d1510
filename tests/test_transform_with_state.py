"""Gate for the transformWithStateInPandas operator
(streaming/windows.py transform_with_state_stats).

ENV-BOUNDED, zero-skip policy: the transformWithState Python state-server
protocol needs ``protobuf``. Where it exists (any standard Spark 4
deployment) the test runs the stream and checks parity with the batch
aggregate; where it doesn't (this container — installs disallowed) the
test asserts the documented fail-fast contract instead: the builder
raises NotImplementedError naming the missing dependency BEFORE a stream
starts. Either way the environment's actual behavior is asserted — no
silent skip. The in-contract arbitrary-stateful coverage is T8
(applyInPandasWithState), which has no protobuf dependency.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.streaming import windows


@pytest.fixture
def sf_dir() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_transform_with_state_contract(spark, sf_dir):
    ev = windows.stream_events(spark, sf_dir).filter(F.col("user_id") < 10)

    if not windows.transform_with_state_available():
        # degraded-environment contract: loud, actionable, pre-stream
        with pytest.raises(NotImplementedError, match="protobuf"):
            windows.transform_with_state_stats(ev)
        return

    # full-environment contract: streamed per-user stats == batch aggregate
    # caller contract (see transform_with_state_stats): RocksDB provider
    # must be active when the stream STARTS; save/restore around the run
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = windows.run_available_now(
            windows.transform_with_state_stats(ev), output_mode="update"
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    got = {
        r["user_id"]: (r["n_events"], r["id_checksum"], r["max_value"])
        for r in out
    }
    from weather_etl_docker_airflow_project_spark.io import load_table

    want = {
        r["user_id"]: (r["n"], r["chk"], r["mx"])
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("chk"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want
