"""JDBC source/sink + DDL parity (SURVEY.md §2.1 S3-S5).

The reference's load path is mysql-connector DDL + parameterized INSERTs
(``airflow/dags/weather_etl.py:35-87,138-194``). Spark-native: ``df.write
.jdbc(mode='append')`` batches whole partitions per connection instead of
one INSERT per record, and table creation rides ``createTableColumnTypes``.
Database/user/grant DDL (weather_etl.py:45-48) has no Spark data-plane
equivalent — it stays an ops-side bootstrap (documented, not emulated).

No MySQL server exists in this environment, but the write path is EXECUTED
end-to-end against embedded Apache Derby (shipped in Spark's own jars):
tests/test_io_sources.py appends through this module, reads back through
``jdbc_read``, and replays the reference's dedup-before-insert. Pointing at
MySQL is a URL + driver-class swap — no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WEATHER_DDL_COLUMNS = (
    # mirrors weather_etl.py:67-77 minus AUTO_INCREMENT id (FIXTURES.md §A2)
    "city VARCHAR(255), temperature FLOAT, weather VARCHAR(255), "
    "humidity INT, pressure INT, wind_speed FLOAT, lt VARCHAR(255), utc VARCHAR(255)"
)

DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby connection URL (creates the database on first use).
    Derby runs inside the Spark JVM — the test/CI stand-in for a MySQL
    service, with the identical DataFrameWriter/Reader code path."""
    return f"jdbc:derby:{db_dir};create=true"


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    create_table_column_types: str | None = WEATHER_DDL_COLUMNS,
    driver: str | None = None,
) -> None:
    """S3 append sink. ``batchsize`` controls rows per INSERT batch — the
    scale-out replacement for the reference's 1 row / 2 round trips
    (weather_etl.py:158-184)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    if user is not None:
        writer = writer.option("user", user).option("password", password or "")
    if driver:
        writer = writer.option("driver", driver)
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    writer.save()


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
) -> DataFrame:
    """JDBC source for the sink-probe side of the dedup upsert: filters and
    projections on the result push down to the database (the reference's
    server-side ``SELECT COUNT(*) WHERE city=%s AND utc=%s`` probe,
    weather_etl.py:158-166, generalized)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if user is not None:
        reader = reader.option("user", user).option("password", password or "")
    if driver:
        reader = reader.option("driver", driver)
    return reader.load()


def jdbc_table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
) -> bool:
    """Explicit table-existence probe via JDBC ``DatabaseMetaData`` —
    vendor-neutral by construction (Derby upper-cases unquoted identifiers,
    MySQL preserves case; compare case-insensitively). This replaces
    exception-message sniffing in the streaming upsert's first-batch path:
    message text differs per vendor ("Table ... does not exist" vs
    "Table ... doesn't exist"), so substring matching either kills the
    stream on its first batch or silently swallows transient errors."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    if user is not None:
        props.setProperty("user", user)
        props.setProperty("password", password or "")
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        rs = conn.getMetaData().getTables(None, None, "%", None)
        try:
            want = table.lower()
            while rs.next():
                if rs.getString("TABLE_NAME").lower() == want:
                    return True
            return False
        finally:
            rs.close()
    finally:
        conn.close()


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
