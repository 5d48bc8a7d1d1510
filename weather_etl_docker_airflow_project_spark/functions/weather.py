"""The reference's transform, rebuilt as pure column expressions
(SURVEY.md §2.2 P1/P2, §2.8 F1-F3).

Reference semantics (``airflow/dags/weather_etl.py:113-135``):
- flatten nested paths to an 8-field record (:122-131);
- ``utc`` = epoch ``dt`` rendered as ``'%Y-%m-%d %H:%M:%S'`` in UTC (:119,:130);
- ``lt``  = the SAME rendering of ``dt + timezone`` — a fixed-offset shift
  using the API's offset-seconds field, NOT an IANA zone conversion, no DST
  (:120,:129);
- timestamps are stored as STRINGS (DDL :75-76) and dedup compares string
  equality — preserved bit-for-bit here.

Everything compiles to whole-stage-codegen'd JVM expressions; the
row-at-a-time Python dict handling of the reference is gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIME_FMT = "yyyy-MM-dd HH:mm:ss"  # reference '%Y-%m-%d %H:%M:%S' (:129-130)


def transform_weather(raw: DataFrame) -> DataFrame:
    """Nested raw observation -> flat sink row (weather_etl.py:122-131).

    Requires ``spark.sql.session.timeZone=UTC`` (set by session.build_session
    and asserted by the pipeline entrypoints) so ``date_format`` renders the
    internal UTC instant unshifted — exactly the reference's
    ``datetime.fromtimestamp(dt, tz=timezone.utc)``.
    """
    return raw.select(
        F.col("name").alias("city"),                                    # :123
        F.col("main.temp").cast("float").alias("temperature"),          # :124
        F.element_at("weather", 1).getField("description").alias("weather"),  # :125
        F.col("main.humidity").alias("humidity"),                       # :126
        F.col("main.pressure").alias("pressure"),                       # :127
        F.col("wind.speed").cast("float").alias("wind_speed"),          # :128
        F.date_format(
            F.timestamp_seconds(F.col("dt") + F.col("timezone")), TIME_FMT
        ).alias("lt"),                                                   # :120,:129
        F.date_format(F.timestamp_seconds(F.col("dt")), TIME_FMT).alias("utc"),  # :119,:130
    )


def require_utc_session(df: DataFrame) -> None:
    """Fail fast if the session timezone would shift time rendering or
    bucketing: used by the weather transform (lt/utc strings) and by every
    query whose output depends on session-TZ time semantics
    (``window()`` buckets, ``date_trunc`` on naive timestamps) — an
    explicit error beats silently-shifted buckets the oracle can't match."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"query requires spark.sql.session.timeZone=UTC for deterministic "
            f"time bucketing/rendering, got {tz!r}"
        )
