"""SCD2 semantics on crafted changes (operators/scd2.py) and the
executor-parallel REST fan-out plumbing (sources/rest.fetch_many)."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.fixtures import CANNED_WEATHER
from weather_etl_docker_airflow_project_spark.functions.weather import transform_weather
from weather_etl_docker_airflow_project_spark.operators.scd2 import (
    latest_change_per_key,
    scd2_apply,
)
from weather_etl_docker_airflow_project_spark.sources.rest import fetch_many


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, "A", "2020-01-01 00:00:00", None, True),
            (2, "B", "2020-01-01 00:00:00", None, True),
            # key 3 already has history: one closed + one live version
            (3, "C", "2020-01-01 00:00:00", "2021-01-01 00:00:00", False),
            (3, "D", "2021-01-01 00:00:00", None, True),
        ],
        "k int, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )


def test_scd2_change_noop_and_history(spark):
    changes = spark.createDataFrame(
        [(1, "A2", "2022-06-01 00:00:00"),   # real change
         (2, "B", "2022-06-01 00:00:00")],   # no-op: same attr
        "k int, attr string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_apply(_dim(spark), changes, key="k", tracked=["attr"], ts_col="ts")
    rows = {(r["k"], r["attr"], r["is_current"]): r for r in out.collect()}
    assert out.count() == 5                                   # 4 + 1 new version
    assert (1, "A", False) in rows                            # closed
    assert str(rows[(1, "A", False)]["valid_to"]) == "2022-06-01 00:00:00"
    assert (1, "A2", True) in rows                            # opened
    assert (2, "B", True) in rows                             # no-op untouched
    assert rows[(2, "B", True)]["valid_to"] is None
    assert (3, "C", False) in rows and (3, "D", True) in rows  # history intact


def test_scd2_idempotent_reapply(spark):
    changes = spark.createDataFrame(
        [(1, "A2", "2022-06-01 00:00:00")], "k int, attr string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    once = scd2_apply(_dim(spark), changes, key="k", tracked=["attr"], ts_col="ts")
    twice = scd2_apply(once, changes, key="k", tracked=["attr"], ts_col="ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_latest_change_per_key(spark):
    changes = spark.createDataFrame(
        [(1, "X", "2022-01-01 00:00:00"), (1, "Y", "2022-02-01 00:00:00")],
        "k int, attr string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kept = latest_change_per_key(changes, "k", "ts").collect()
    assert len(kept) == 1 and kept[0]["attr"] == "Y"


def test_fetch_many_executor_fanout(spark):
    """URL table -> mapInPandas fetch with an injected offline fetcher;
    result flows through the standard transform unchanged."""
    by_city = {r["name"]: r for r in CANNED_WEATHER}
    urls = spark.createDataFrame(
        [(f"http://api.example/weather?q={c}", c) for c in by_city],
        "url string, city string",
    ).repartition(4)

    def fake_fetch(url: str) -> dict:
        return by_city[url.rsplit("=", 1)[1]]

    raw = fetch_many(urls.select("url"), fetch_fn=fake_fetch)
    flat = transform_weather(raw)
    got = {r["city"]: r for r in flat.collect()}
    assert set(got) == set(by_city)
    assert got["Tunis"]["utc"] == "2023-10-08 08:00:00"
