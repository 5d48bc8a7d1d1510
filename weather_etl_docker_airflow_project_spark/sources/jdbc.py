"""JDBC sink + DDL parity (SURVEY.md §2.1 S3-S5).

The reference's load path is mysql-connector DDL + parameterized INSERTs
(``airflow/dags/weather_etl.py:35-87,138-194``). Spark-native: ``df.write
.jdbc(mode='append')`` batches whole partitions per connection instead of
one INSERT per record, and table creation rides ``createTableOptions``.
Database/user/grant DDL (weather_etl.py:45-48) has no Spark data-plane
equivalent — it stays an ops-side bootstrap (documented, not emulated).

No MySQL exists in this environment, so these helpers are exercised only
for plan construction in tests; the parquet sink (operators/upsert.py) is
the tested upsert path with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

WEATHER_DDL_COLUMNS = (
    # mirrors weather_etl.py:67-77 minus AUTO_INCREMENT id (FIXTURES.md §A2)
    "city VARCHAR(255), temperature FLOAT, weather VARCHAR(255), "
    "humidity INT, pressure INT, wind_speed FLOAT, lt VARCHAR(255), utc VARCHAR(255)"
)


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    batchsize: int = 10_000,
    create_table_column_types: str | None = WEATHER_DDL_COLUMNS,
) -> None:
    """S3 append sink. ``batchsize`` controls rows per INSERT batch — the
    scale-out replacement for the reference's 1 row / 2 round trips."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    writer.save()


def catalog_ddl(spark, database: str = "weather_db", table: str = "weather") -> None:
    """S4/S5 on the Spark catalog: idempotent CREATE DATABASE/TABLE IF NOT
    EXISTS — the reference's bootstrap tasks as run-once session init
    (weather_etl.py:45-48,66-78)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {database}.{table} (
            city STRING, temperature FLOAT, weather STRING,
            humidity INT, pressure INT, wind_speed FLOAT,
            lt STRING, utc STRING
        ) USING parquet
        """
    )
