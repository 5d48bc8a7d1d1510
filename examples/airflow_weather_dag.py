"""Airflow-orchestration example (BASELINE spark_approach: "Spark jobs
orchestrated by Airflow").

The reference wires extract/transform/load as separate Airflow tasks with
records serialized through XCom (``airflow/dags/weather_etl.py:228``).
With the Spark engine, Airflow's job shrinks to scheduling ONE
spark-submit per tick — the reference's cadence (:29), retries (:20-21)
and catchup=False (:31) stay in Airflow; the data plane lives entirely in
Spark, and nothing rides XCom.

This file is an example, not an import target of the engine: Airflow is
not installed in this environment, so the import is guarded.
"""

from __future__ import annotations

from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )
except ImportError:  # Airflow not installed here — example only
    DAG = None

if DAG is not None:
    with DAG(
        dag_id="weather_spark_ingest",
        start_date=datetime(2024, 1, 1),
        schedule_interval=timedelta(minutes=2),  # reference cadence (:29)
        catchup=False,                           # reference behavior  (:31)
        default_args={
            "retries": 1,                        # reference retries  (:20)
            "retry_delay": timedelta(minutes=5), # reference delay    (:21)
        },
    ) as dag:
        # ONE task replaces the reference's 5-task chain: DDL bootstrap is
        # the engine's idempotent session init, extract/transform/load are
        # one lazy DataFrame lineage inside the job.
        ingest = SparkSubmitOperator(
            task_id="ingest_once",
            application="-m weather_etl_docker_airflow_project_spark",
            application_args=["ingest-once", "--sink", "/data/weather"],
            # WEATHER_* come from the same .env contract the reference
            # documents (README.md:66-72)
            env_vars={
                "WEATHER_API_KEY": "{{ var.value.weather_api_key }}",
                "WEATHER_CITY": "{{ var.value.weather_city }}",
                "WEATHER_LANG": "{{ var.value.weather_lang }}",
                "WEATHER_UNITS": "{{ var.value.weather_units }}",
            },
        )
