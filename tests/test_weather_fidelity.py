"""Reference-fidelity tests (SURVEY.md §5.2-5.3): golden transform output,
upsert idempotence, late/duplicate-arrival invariance, and the full
micro-batch stream cycle."""

from __future__ import annotations

import pytest

from weather_etl_docker_airflow_project_spark.fixtures import (
    CANNED_WEATHER,
    EXPECTED_WEATHER_ROWS,
)
from weather_etl_docker_airflow_project_spark.functions.weather import transform_weather
from weather_etl_docker_airflow_project_spark.operators.upsert import upsert_parquet
from weather_etl_docker_airflow_project_spark.sources.rest import (
    ExtractError,
    build_owm_url,
    records_to_df,
)
from weather_etl_docker_airflow_project_spark.streaming.pipeline import (
    DEDUP_KEYS,
    land_records,
    run_cycle,
    start_stream,
)


def _approx_row(row):
    return (row[0], round(row[1], 2), row[2], row[3], row[4], round(row[5], 2), row[6], row[7])


def test_golden_transform(spark):
    """One canned record -> exactly the 8-field row the reference would
    produce, including string lt/utc (weather_etl.py:119-131)."""
    flat = transform_weather(records_to_df(spark, CANNED_WEATHER))
    assert flat.columns == ["city", "temperature", "weather", "humidity", "pressure", "wind_speed", "lt", "utc"]
    got = sorted((_approx_row(tuple(r)) for r in flat.collect()))
    expected = sorted(_approx_row(r) for r in EXPECTED_WEATHER_ROWS)
    assert got == expected


def test_upsert_idempotence(spark, tmp_path):
    """load . load == load (reference dedup, weather_etl.py:158-187)."""
    sink = str(tmp_path / "weather_sink")
    fetch = lambda: CANNED_WEATHER  # noqa: E731
    n1 = run_cycle(spark, fetch, sink)
    assert n1 == 3
    n2 = run_cycle(spark, fetch, sink)
    assert n2 == 0
    assert spark.read.parquet(sink).count() == 3


def test_upsert_intra_batch_duplicates(spark, tmp_path):
    """A batch containing the same (city, utc) twice inserts once — the
    batch generalization of the reference's serial-schedule assumption."""
    sink = str(tmp_path / "weather_sink2")
    doubled = CANNED_WEATHER + [dict(CANNED_WEATHER[0])]
    n = run_cycle(spark, lambda: doubled, sink)
    assert n == 3
    assert spark.read.parquet(sink).count() == 3


def test_upsert_late_arrival_new_observation(spark, tmp_path):
    """A genuinely new observation time for a known city IS inserted."""
    sink = str(tmp_path / "weather_sink3")
    run_cycle(spark, lambda: CANNED_WEATHER, sink)
    newer = dict(CANNED_WEATHER[0])
    newer["dt"] = CANNED_WEATHER[0]["dt"] + 7200
    n = run_cycle(spark, lambda: [newer], sink)
    assert n == 1
    sunk = spark.read.parquet(sink)
    assert sunk.count() == 4
    assert sunk.dropDuplicates(DEDUP_KEYS).count() == 4


def test_stream_cycle_available_now(spark, tmp_path):
    """T1/T2/T3: land raw JSON, drain the file stream with availableNow,
    and exactly one copy per (city, utc) reaches the sink — even when the
    same observations are landed again in a second file."""
    landing = str(tmp_path / "landing")
    sink = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")
    land_records(lambda: CANNED_WEATHER, landing)
    q = start_stream(spark, landing, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 3

    # redelivered data in a NEW file (new offset): picked up, deduped away
    land_records(lambda: CANNED_WEATHER, landing)
    q2 = start_stream(spark, landing, sink, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 3


def test_load_error_swallow_parity(spark, tmp_path):
    """Reference parity: the load task swallows sink errors (log-only
    except, weather_etl.py:190-191) so a failed load doesn't fail the run;
    strict mode (our default) propagates instead."""
    not_a_dir = tmp_path / "file_in_the_way"
    not_a_dir.write_text("occupied")
    sink = str(not_a_dir / "weather")  # parent is a file -> write fails
    assert run_cycle(spark, lambda: CANNED_WEATHER, sink, strict_load=False) == 0
    with pytest.raises(Exception):
        run_cycle(spark, lambda: CANNED_WEATHER, sink, strict_load=True)


def test_extract_fail_fast():
    """Missing config raises (weather_etl.py:98-99 fail-fast guard)."""
    with pytest.raises(ExtractError):
        build_owm_url("", "Tunis", "fr", "metric")
    url = build_owm_url("KEY", "Marseille", "fr", "metric")
    # exact reference URL shape (weather_etl.py:103)
    assert url == (
        "http://api.openweathermap.org/data/2.5/weather"
        "?q=Marseille&lang=fr&appid=KEY&units=metric"
    )


def test_upsert_self_heals_torn_empty_sink_dir(spark, tmp_path):
    """A sink directory that exists but holds no readable parquet (killed
    first write) must be treated as fresh, not wedge every later upsert."""
    import os

    from weather_etl_docker_airflow_project_spark.operators.upsert import (
        upsert_parquet,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(os.path.join(sink, "_temporary"))  # torn first attempt
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert upsert_parquet(spark, df, sink, ["k"]) == 2
    assert upsert_parquet(spark, df, sink, ["k"]) == 0  # idempotent after heal
