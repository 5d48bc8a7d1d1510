"""Canned OpenWeatherMap-shaped observations (FIXTURES.md §A1) used by the
golden tests and the driver-facing reference-fidelity query. Offsets
include a non-hour zone (+5:30) and a negative zone (-8:00) to pin the
fixed-offset (non-IANA) shift semantics of weather_etl.py:120."""

from __future__ import annotations

CANNED_WEATHER: list[dict] = [
    {
        "name": "Tunis",
        "dt": 1696752000,  # 2023-10-08 08:00:00 UTC
        "timezone": 3600,
        "main": {"temp": 24.91, "humidity": 57, "pressure": 1015},
        "weather": [
            {"description": "clear sky", "main": "Clear"},
            {"description": "unused second element", "main": "X"},
        ],
        "wind": {"speed": 4.63},
    },
    {
        "name": "Mumbai",
        "dt": 1696753800,  # 2023-10-08 08:30:00 UTC
        "timezone": 19800,  # +5:30 — non-hour offset
        "main": {"temp": 31.2, "humidity": 74, "pressure": 1008},
        "weather": [{"description": "haze", "main": "Haze"}],
        "wind": {"speed": 2.1},
    },
    {
        "name": "San Francisco",
        "dt": 1696752000,
        "timezone": -28800,  # -8:00
        "main": {"temp": 17.8, "humidity": 81, "pressure": 1012},
        "weather": [{"description": "mist", "main": "Mist"}],
        "wind": {"speed": 5.36},
    },
]

# Expected flat rows after transform (hand-computed; golden for tests and
# the literal-SELECT oracle).
EXPECTED_WEATHER_ROWS = [
    # city, temperature, weather, humidity, pressure, wind_speed, lt, utc
    ("Tunis", 24.91, "clear sky", 57, 1015, 4.63, "2023-10-08 09:00:00", "2023-10-08 08:00:00"),
    ("Mumbai", 31.2, "haze", 74, 1008, 2.1, "2023-10-08 14:00:00", "2023-10-08 08:30:00"),
    (
        "San Francisco",
        17.8,
        "mist",
        81,
        1012,
        5.36,
        "2023-10-08 00:00:00",
        "2023-10-08 08:00:00",
    ),
]
