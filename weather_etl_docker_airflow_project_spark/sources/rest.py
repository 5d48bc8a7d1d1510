"""REST/JSON source (SURVEY.md §2.1 S1/S2).

The reference does one HTTP GET per run against OpenWeatherMap, fails fast
on HTTP errors, and parses the body as nested JSON
(``airflow/dags/weather_etl.py:90-110``: GET at :103, raise_for_status at
:104, json() at :105). Natively: the fetch stays a *driver-side* call (one
tiny record per tick — shipping it to executors would be pure overhead),
and the record immediately becomes a DataFrame with an explicit schema so
everything downstream is JVM-side.

At scale this generalizes: many endpoints/cities per tick -> parallelize
the fetch list with ``spark.createDataFrame(urls).mapInPandas(fetch)`` so
executors fetch concurrently; the single-record path below is the
reference-fidelity case.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import WEATHER_RAW_SCHEMA


class ExtractError(RuntimeError):
    """Fail-fast extract failure (reference AirflowFailException analogue,
    weather_etl.py:99,110)."""


def build_owm_url(api_key: str, city: str, lang: str, units: str) -> str:
    """URL construction exactly as the reference does (weather_etl.py:103:
    ``q={city}&lang={lang}&appid={api_key}&units={units}``), with the same
    fail-fast guard over the same four env-sourced values (:93-99)."""
    if not api_key or not city or not lang or not units:
        # fail-fast env validation (weather_etl.py:98-99)
        raise ExtractError("missing api_key/city/lang/units configuration")
    return (
        "http://api.openweathermap.org/data/2.5/weather"
        f"?q={city}&lang={lang}&appid={api_key}&units={units}"
    )


def fetch_from_env() -> list[dict]:
    """Production fetch closure honoring the reference's .env contract
    (README.md:66-72: WEATHER_API_KEY / WEATHER_CITY / WEATHER_LANG /
    WEATHER_UNITS)."""
    import os

    url = build_owm_url(
        os.getenv("WEATHER_API_KEY", ""),
        os.getenv("WEATHER_CITY", ""),
        os.getenv("WEATHER_LANG", ""),
        os.getenv("WEATHER_UNITS", ""),
    )
    return [fetch_json(url)]


def fetch_json(url: str, timeout: float = 10.0) -> dict:
    """One GET, fail-fast on HTTP errors (weather_etl.py:103-105)."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if resp.status >= 400:
                raise ExtractError(f"HTTP {resp.status} from {url}")
            return json.loads(resp.read().decode("utf-8"))
    except (urllib.error.URLError, OSError, ValueError) as exc:
        raise ExtractError(f"extract failed: {exc}") from exc


def project_raw(rec: dict) -> dict:
    """Project an arbitrary OWM-shaped dict onto WEATHER_RAW_SCHEMA's key
    paths: unknown keys dropped, missing keys null (schema-on-read dict
    of weather_etl.py:105 replaced by an explicit contract)."""
    main = rec.get("main") or {}
    wind = rec.get("wind") or {}
    weather = rec.get("weather") or []
    return {
        "name": rec.get("name"),
        "dt": rec.get("dt"),
        "timezone": rec.get("timezone"),
        "main": {
            "temp": main.get("temp"),
            "humidity": main.get("humidity"),
            "pressure": main.get("pressure"),
        },
        "weather": [
            {"description": w.get("description"), "main": w.get("main")} for w in weather
        ],
        "wind": {"speed": wind.get("speed")},
    }


def records_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Materialize raw JSON records with the explicit nested schema (S2)."""
    return spark.createDataFrame([project_raw(r) for r in records], WEATHER_RAW_SCHEMA)


def fetch_many(
    urls: DataFrame,
    fetch_fn: Callable[[str], dict] = fetch_json,
    url_col: str = "url",
) -> DataFrame:
    """Executor-parallel fan-out: fetch every URL of a (possibly huge) URL
    table from the executors via mapInPandas — the scale path when one
    tick polls thousands of endpoints instead of the reference's one
    (weather_etl.py:103). Each partition's worker fetches its slice;
    repartition the URL table to control concurrency. Failures follow the
    reference's fail-fast extract semantics (the task raises)."""
    import pandas as pd

    def _fetch(batches):
        for pdf in batches:
            yield pd.DataFrame([project_raw(fetch_fn(u)) for u in pdf[url_col]])

    return urls.mapInPandas(_fetch, WEATHER_RAW_SCHEMA)


def extract(
    spark: SparkSession,
    fetch_fn: Callable[[], list[dict]],
) -> DataFrame:
    """S1 extract step: fetch via the injected callable (production: a
    closure over fetch_json+build_owm_url; tests: canned records) and
    return the raw typed DataFrame."""
    return records_to_df(spark, fetch_fn())
