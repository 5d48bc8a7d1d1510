"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``mnassrib/weather-etl-docker-airflow-project``
(an Airflow-orchestrated weather ETL micro-pipeline), generalized to a full
relational + streaming + LLM-data-pipeline surface per SURVEY.md.

Layout:
    session.py    -- SparkSession builder (UTC session TZ, AQE on)
    schemas.py    -- explicit StructTypes (weather raw/sink, testdata tables)
    io.py         -- table catalog loaders over the driver testdata
    sources/      -- REST/JSON poller, JDBC, file scans
    operators/    -- upsert (anti-join append), as-of join, top-k, dedup,
                     similarity search, multimodal plumbing
    functions/    -- weather transform fidelity fns, text analysis, vectors
    plans/        -- the query registry (name -> Spark callable + oracle SQL)
    streaming/    -- micro-batch pipeline (trigger + foreachBatch upsert)
"""

__version__ = "0.1.0"

# Curated top-level API: a reference user's day-one surface.
from .session import build_session  # noqa: E402,F401
from .io import load_table, load_tables, register_views  # noqa: E402,F401
from .functions.weather import transform_weather  # noqa: E402,F401
from .operators.upsert import upsert_parquet  # noqa: E402,F401
from .operators.asof import asof_join  # noqa: E402,F401
from .streaming.pipeline import land_records, run_cycle, start_stream  # noqa: E402,F401

__all__ = [
    "build_session",
    "load_table",
    "load_tables",
    "register_views",
    "transform_weather",
    "upsert_parquet",
    "asof_join",
    "land_records",
    "run_cycle",
    "start_stream",
]
