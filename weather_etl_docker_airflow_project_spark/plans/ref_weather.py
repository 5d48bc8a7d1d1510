"""Driver-checked reference-fidelity query (SURVEY.md §2 REF rows S1/S2/S9,
P1/P2, F1-F3): the canned OpenWeatherMap observations through the native
ingest+transform path, oracle-checked against hand-computed literals.

The oracle is a table-free literal SELECT — the transform of a fixed input
is a fixed output, so this gives the REF operator set a real value-hash
check instead of a rows-only pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..fixtures import CANNED_WEATHER
from ..functions.weather import transform_weather
from ..sources.rest import records_to_df
from .registry import query

_LITERAL_ORACLE = """
SELECT * FROM (VALUES
    ('Tunis', CAST(24.91 AS FLOAT), 'clear sky', CAST(57 AS INT), CAST(1015 AS INT),
     CAST(4.63 AS FLOAT), '2023-10-08 09:00:00', '2023-10-08 08:00:00'),
    ('Mumbai', CAST(31.2 AS FLOAT), 'haze', CAST(74 AS INT), CAST(1008 AS INT),
     CAST(2.1 AS FLOAT), '2023-10-08 14:00:00', '2023-10-08 08:30:00'),
    ('San Francisco', CAST(17.8 AS FLOAT), 'mist', CAST(81 AS INT), CAST(1012 AS INT),
     CAST(5.36 AS FLOAT), '2023-10-08 00:00:00', '2023-10-08 08:00:00')
) AS t(city, temperature, weather, humidity, pressure, wind_speed, lt, utc)
"""


@query(
    "ref_weather_transform",
    oracle=_LITERAL_ORACLE,
    tags=("S1", "S2", "S9", "P1", "P2", "F1", "F2", "F3"),
    doc="Reference pipeline fidelity: nested JSON -> flat 8-field row with "
    "string lt/utc (weather_etl.py:113-135), incl. non-hour (+5:30) and "
    "negative offsets.",
)
def ref_weather_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LTZ rendering in date_format depends on session tz; pin UTC (the
    # engine's own sessions already are — this covers foreign sessions).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return transform_weather(records_to_df(spark, CANNED_WEATHER))
