"""Round-12 gates, part 5: the versioned-table BATCH DataSource
(`spark.read.format("versioned_table")`) — snapshot + time-travel reads
through the vanilla Spark reader API, with recorded-schema null-fill,
column-mapping resolution, DV application, and pushed-filter dir
pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    delete_by_keys,
    merge_upsert,
    rename_column,
)
from weather_etl_docker_airflow_project_spark.sources import versioned_stream
from weather_etl_docker_airflow_project_spark.sources.versioned_stream import (
    VersionedTableBatchReader,
)


def _read(spark, t, **opts):
    versioned_stream.register(spark)
    r = spark.read.format("versioned_table").option("tableDir", t.dir)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_snapshot_and_version_as_of(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(30)]))
    t.commit(
        spark.createDataFrame([Row(k=100 + i, v=0.0) for i in range(5)]),
        mode="append",
    )
    assert _read(spark, t).count() == 35
    assert _read(spark, t, versionAsOf=1).count() == 30
    got = sorted(r.k for r in _read(spark, t, versionAsOf=1).collect())
    assert got == list(range(30))


def test_timestamp_as_of(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=1)]))
    ts_between = t.commit_timestamp(1) + 0.0001
    t.commit(spark.createDataFrame([Row(k=2)]), mode="append")
    assert _read(spark, t, timestampAsOf=ts_between).count() == 1


def test_dv_applied_and_evolution_null_fill(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 4)
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]))
    delete_by_keys(
        t, spark.createDataFrame([Row(k=3), Row(k=7)]), keys=["k"],
        merge_on_read=True,
    )
    t.commit(
        spark.createDataFrame([Row(k=50, v=1.0, extra="x")]),
        mode="append",
        allow_schema_evolution=True,
    )
    df = _read(spark, t)
    assert df.columns == ["k", "v", "extra"]
    ks = {r.k for r in df.collect()}
    assert 3 not in ks and 7 not in ks and 50 in ks and len(ks) == 19
    assert df.filter(F.col("extra").isNull()).count() == 18
    # re-inserted deleted key (uncovered dir) is visible again
    merge_upsert(
        t,
        spark.createDataFrame([Row(k=3, v=-3.0, extra="back")]),
        keys=["k"],
    )
    assert _read(spark, t).filter(F.col("k") == 3).first().v == -3.0


def test_column_mapping_resolved(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.commit(spark.createDataFrame([Row(k=1, v="a")]))
    rename_column(t, "v", "val")
    df = _read(spark, t)
    assert df.columns == ["k", "val"]
    assert df.first().val == "a"
    # time travel keeps the old name
    assert _read(spark, t, versionAsOf=1).columns == ["k", "v"]


def test_pushed_filters_prune_dirs(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    for lo in range(0, 400, 100):
        t.commit(
            spark.createDataFrame(
                [Row(k=i, v=float(i)) for i in range(lo, lo + 100)]
            ),
            mode="append",
        )
    # results exact under pruning
    df = _read(spark, t).filter((F.col("k") >= 150) & (F.col("k") < 240))
    assert sorted(r.k for r in df.collect()) == list(range(150, 240))
    # the reader's planning really prunes: 2 of 4 dirs survive the stats
    import os as _os

    def _dirs(reader):
        return {
            _os.path.dirname(p.path) for p in reader.partitions() if p.path
        }

    reader = VersionedTableBatchReader(
        t.snapshot_schema(4), {"tabledir": t.dir}
    )
    list(reader.pushFilters([]))  # no filters: all dirs
    assert len(_dirs(reader)) == 4
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    reader2 = VersionedTableBatchReader(
        t.snapshot_schema(4), {"tabledir": t.dir}
    )
    handed_back = list(
        reader2.pushFilters(
            [GreaterThanOrEqual(("k",), 150), LessThan(("k",), 240)]
        )
    )
    assert len(handed_back) == 2  # Spark re-applies everything
    assert len(_dirs(reader2)) == 2


def test_bad_version_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=1)]))
    with pytest.raises(Exception, match="not committed"):
        _read(spark, t, versionAsOf=9).count()
