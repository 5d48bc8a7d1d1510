"""Table catalog over the driver testdata (SURVEY.md §2.1 S6).

At 100 TB these reads become partitioned parquet/Delta directory scans; the
access pattern is identical — ``spark.read.parquet`` with Catalyst doing
predicate pushdown, column pruning, and partition pruning. Nothing here
collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S6).

    ``events.ts`` has shipped as two different physical types across
    testdata generations, so the reader self-adapts and normalizes both to
    session TIMESTAMP (what every downstream window/watermark/oracle
    expects; the session tz is UTC, matching DuckDB's naive read):

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; with
      ``nanosAsLong`` it loads as long nanos, which we integer-divide to
      micros (exactly DuckDB's nanos->micros truncation).
    - timestamp[us] with isAdjustedToUTC=false: loads as TIMESTAMP_NTZ;
      cast to TIMESTAMP (identity wall-clock in a UTC session).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F  # local import: keep module light
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_csv(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    """S7: CSV scan with an explicit schema — never inference in production
    paths (inference double-reads the data and guesses types)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    """S7: JSON-lines scan with an explicit schema."""
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """S8: hive-layout partitioned parquet sink. Readers filtering on the
    partition columns scan only matching directories (partition pruning);
    choose low-cardinality columns (date, source) — at 100 TB, thousands of
    partitions is healthy, millions of tiny files is not."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (hash-partitioned files + metadata): two
    tables bucketed the same way on the join key sort-merge-join with NO
    exchange on either side — the shuffle is paid once at write time, then
    every subsequent join of any two co-bucketed tables is shuffle-free.
    This is the batch answer to repeated large-fact joins at 100 TB
    (n_buckets ~ cluster cores; same bucketing spec on both tables)."""
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).format("parquet").saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so ``spark.sql`` queries
    see the same names DuckDB's oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def scratch_dir(prefix: str) -> str:
    """Process-scoped scratch directory: a fresh mkdtemp (collision-safe
    under concurrent drivers) registered for removal at interpreter exit —
    query sinks must outlive the lazy plan's collect() but not the
    process, and un-reclaimed copies of fact tables otherwise accumulate
    across bench/driver runs."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d
