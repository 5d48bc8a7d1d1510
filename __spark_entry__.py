"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``weather_etl_docker_airflow_project_spark.plans``): every SURVEY.md §2
operator registers a Spark callable plus (where SQL-expressible) a DuckDB
oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.REGISTRY["flagship"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.all_queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL for DuckDB, keyed like ``queries()``; ops that
    are not SQL-expressible are omitted (rows-only check)."""
    return catalog.all_oracles()
