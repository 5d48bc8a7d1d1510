"""Idempotent upsert: the reference's dedup-before-insert rebuilt natively.

The reference probes the sink per record (``SELECT COUNT(*) ... WHERE
city=%s AND utc=%s`` then INSERT — ``airflow/dags/weather_etl.py:158-187``,
two round trips per row). The Spark-native equivalent is a single
left-anti join of the whole incoming batch against the sink keys
(SURVEY.md §2.3 J5 / §2.9 T2): one plan, one pass, >=10^4 rows/s instead
of 1 row per 2-minute run.

Scale notes: the anti-join shuffles on the natural key unless the existing
key-set is small enough to broadcast; we read ONLY the key columns from the
sink (column pruning reaches the parquet scan). For a true 100 TB sink the
right answer is a storage-level MERGE (Delta/Iceberg) or partition-pruned
key read (e.g. restrict existing keys to the incoming batch's date range);
``key_pruning_filter`` exposes that hook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def dedup_new_rows(incoming: DataFrame, existing_keys: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``incoming`` whose key tuple is absent from ``existing_keys``
    (left-anti join, J5). Also dedups within the batch itself — the
    reference's serial schedule made intra-batch dups impossible; a batch
    engine must handle them."""
    batch_deduped = incoming.dropDuplicates(keys)
    return batch_deduped.join(existing_keys.select(*keys), on=keys, how="left_anti")


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    key_pruning_filter: Column | None = None,
) -> int:
    """Append only never-seen-before rows to a parquet sink; returns the
    number of appended rows. Idempotent: running twice with the same batch
    appends zero the second time (reference semantics,
    ``weather_etl.py:158-187``)."""
    # Probe the sink with the Hadoop FileSystem API rather than a
    # read-then-catch(AnalysisException): the failed read makes the JVM
    # log a full stack trace to stderr on every fresh sink (it polluted
    # the r5 bench tail), and the FS check works identically on local FS,
    # HDFS, and S3A. The except stays as the recovery path for a sink
    # DIRECTORY that exists but holds no readable parquet (a killed
    # first write leaving only _temporary/ or an empty dir): treat it as
    # fresh and self-heal instead of wedging every later upsert.
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    existing = None
    if fs.exists(jpath):
        try:
            existing = spark.read.parquet(path).select(*keys)
            if key_pruning_filter is not None:
                existing = existing.filter(key_pruning_filter)
        except AnalysisException:  # torn/empty sink dir: no committed data
            existing = None
    if existing is None:  # first write: sink holds no readable data yet
        existing = spark.createDataFrame([], incoming.select(*keys).schema)

    new_rows = dedup_new_rows(incoming, existing, keys)
    # Two actions on new_rows: cache so the count doesn't recompute the join.
    new_rows = new_rows.cache()
    try:
        n = new_rows.count()
        if n:
            new_rows.write.mode("append").parquet(path)
    finally:
        new_rows.unpersist()
    return n
