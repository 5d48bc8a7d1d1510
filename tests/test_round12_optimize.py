"""Round-12 gates, part 2: incremental / predicate-scoped OPTIMIZE
ZORDER (the r11 verdict's top task — `cluster_rewrite` was correct but
an unscoped full-snapshot rewrite, unrunnable at 100 TB) and its
coexistence with the key-bucket layout.

The contract under test: scoping changes which dirs get REWRITTEN,
never which rows exist; already-clustered dirs are carried by reference
(byte-identical files); a second OPTIMIZE after a small append rewrites
ONLY the new data.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    _dir_zchunk,
    cluster_rewrite,
    delete_by_keys,
    merge_upsert,
    vacuum,
)


def _slice(spark, lo, hi):
    rows = [
        Row(
            k=i,
            x=float(i % 500),
            d=datetime.date(1995, 1, 1) + datetime.timedelta(days=i % 365),
            v=float(i),
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows)


def _file_bytes(dirs):
    out = {}
    for d in dirs:
        for root, _s, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = open(p, "rb").read()
    return out


def test_incremental_optimize_rewrites_only_new_data(spark, tmp_path):
    """THE verdict's done-criterion: a second OPTIMIZE after a small
    append carries every chunk dir of the first run by reference
    (byte-identical) and rewrites only the appended dirs."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["x", "d"])
    t.commit(_slice(spark, 0, 5000))
    v2 = cluster_rewrite(t, ["x", "d"], n_chunks=8, bits=5)
    clustered = [d for d in t._manifest(v2) if _dir_zchunk(d)]
    assert len(clustered) == len(t._manifest(v2)) == 8
    baseline = _file_bytes(clustered)
    # small append lands unclustered
    t.commit(_slice(spark, 5000, 5500), mode="append")
    v4 = cluster_rewrite(t, ["x", "d"], n_chunks=2, bits=5, incremental=True)
    manifest = t._manifest(v4)
    # every first-run chunk dir carried verbatim...
    for d in clustered:
        assert d in manifest
    for p, b in _file_bytes(clustered).items():
        assert b == baseline[p], f"carried chunk file rewritten: {p}"
    # ...plus exactly the new data's chunks
    new_chunks = [d for d in manifest if d not in clustered]
    assert new_chunks and all(_dir_zchunk(d) for d in new_chunks)
    # rows preserved exactly
    assert t.read(version=v4).count() == 5500
    assert t.read().agg(F.sum("k")).first()[0] == sum(range(5500))


def test_incremental_optimize_noop_when_fully_clustered(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_slice(spark, 0, 1000))
    v2 = cluster_rewrite(t, ["x"], n_chunks=4, bits=5)
    v_again = cluster_rewrite(t, ["x"], n_chunks=4, bits=5, incremental=True)
    assert v_again == v2  # no empty commit published
    assert t.versions()[-1] == v2


def test_predicate_scoped_optimize(spark, tmp_path):
    """OPTIMIZE ... WHERE: only dirs whose recorded stats may match the
    predicate are rewritten; out-of-range dirs carry by reference."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    for lo in range(0, 4000, 1000):
        t.commit(_slice(spark, lo, lo + 1000), mode="append")
    base_dirs = t._manifest(4)
    assert len(base_dirs) == 4
    baseline = _file_bytes(base_dirs)
    v5 = cluster_rewrite(
        t, ["x"], n_chunks=2, bits=5, predicate=[("k", "<", 1000)]
    )
    manifest = t._manifest(v5)
    carried = [d for d in base_dirs if d in manifest]
    # exactly the three out-of-range dirs carried, byte-identical
    assert len(carried) == 3
    for d in carried:
        for p, b in _file_bytes([d]).items():
            assert b == baseline[p]
    assert t.read(version=v5).count() == 4000
    assert t.read().agg(F.sum("k")).first()[0] == sum(range(4000))


def test_optimize_scoped_by_predicate_and_incremental_compose(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    t.commit(_slice(spark, 0, 1000))
    cluster_rewrite(t, ["x"], n_chunks=2, bits=5)
    t.commit(_slice(spark, 1000, 2000), mode="append")  # unclustered
    t.commit(_slice(spark, 2000, 3000), mode="append")  # unclustered
    before = t._manifest(t.versions()[-1])
    # incremental AND predicate: only the unclustered dir matching k<2000
    v = cluster_rewrite(
        t,
        ["x"],
        n_chunks=2,
        bits=5,
        predicate=[("k", "<", 2000)],
        incremental=True,
    )
    manifest = t._manifest(v)
    rewritten = [d for d in before if d not in manifest]
    assert len(rewritten) == 1  # just the 1000..2000 append dir
    assert t.read().count() == 3000


def test_optimize_on_bucketed_table_keeps_granular_merges(spark, tmp_path):
    """The coexistence stretch: one table gets S28 granular writes AND
    z-ordered pruned reads. After OPTIMIZE, a sparse merge still takes
    the bucket-granular path (nested zc=i/bkt=j dirs keep the bkt leaf),
    and a later incremental OPTIMIZE picks up exactly the merge's
    un-clustered rewrites — the liquid-clustering maintenance loop."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 8)
    t.set_stats_columns(["x"])
    t.commit(_slice(spark, 0, 2000))
    v2 = cluster_rewrite(t, ["x"], n_chunks=4, bits=5)
    z_dirs = set(t._manifest(v2))
    assert all(_dir_zchunk(d) for d in z_dirs)
    # sparse merge: granular (carries most zc/bkt dirs by reference)
    src = spark.createDataFrame(
        [Row(k=3, x=3.0, d=datetime.date(2001, 1, 1), v=-3.0)]
    )
    v3 = merge_upsert(t, src, keys=["k"])
    carried = set(t._manifest(v3)) & z_dirs
    # key 3 lives in ONE bucket; only that bucket's dirs (across chunks)
    # may be rewritten — at least the other 7 buckets' dirs carry
    assert len(carried) >= len(z_dirs) - 4
    assert t.read().filter(F.col("k") == 3).first().v == -3.0
    # incremental OPTIMIZE re-clusters exactly the merge's output dirs
    v4 = cluster_rewrite(t, ["x"], n_chunks=2, bits=5, incremental=True)
    assert set(d for d in t._manifest(v4) if d in carried) == carried
    assert t.read(version=v4).count() == 2000
    # granular delete still works post-optimize
    delete_by_keys(
        t, spark.createDataFrame([Row(k=10)]), keys=["k"]
    )
    assert t.read().filter(F.col("k") == 10).count() == 0
    assert t.read().count() == 1999


def test_vacuum_reclaims_nested_chunk_dirs_safely(spark, tmp_path):
    """The recursive-reclaim fix: manifests reference zc=i/bkt=j
    GRANDCHILDREN of a batch dir; vacuum must never rmtree a batch whose
    only live references are two levels down, and must reclaim retired
    sibling subtrees."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 4)
    t.commit(_slice(spark, 0, 800))
    cluster_rewrite(t, ["x"], n_chunks=2, bits=5)
    # granular merge rewrites one bucket: some zc=*/bkt=* dirs retire
    merge_upsert(
        t,
        spark.createDataFrame(
            [Row(k=5, x=5.0, d=datetime.date(2001, 1, 1), v=-5.0)]
        ),
        keys=["k"],
    )
    live_before = sorted(r.k for r in t.read().collect())
    rep = vacuum(t, retain_versions=1)
    # something was reclaimed (v1's batch + the merged bucket's old
    # chunk dirs), and every live row survived
    assert rep.removed_dirs
    assert sorted(r.k for r in t.read().collect()) == live_before
    # the z-order batch dir itself must NOT have been wholesale-removed
    for d in t._manifest(t.versions()[-1]):
        assert os.path.isdir(d), f"live dir vacuumed: {d}"


def test_scoped_optimize_materializes_dvs_of_rewritten_dirs_only(
    spark, tmp_path
):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    t.commit(_slice(spark, 0, 1000))
    cluster_rewrite(t, ["x"], n_chunks=2, bits=5)
    t.commit(_slice(spark, 1000, 2000), mode="append")
    # merge-on-read delete: DV covers ALL current dirs
    delete_by_keys(
        t,
        spark.createDataFrame([Row(k=10), Row(k=1500)]),
        keys=["k"],
        merge_on_read=True,
    )
    assert t.read().count() == 1998
    # incremental optimize rewrites only the unclustered append; its DV
    # deletions materialize, the carried dirs keep DV coverage
    v = cluster_rewrite(t, ["x"], n_chunks=2, bits=5, incremental=True)
    dvs = t.deletion_vectors(v)
    assert dvs, "DV coverage of carried dirs must survive"
    covered = {os.path.realpath(c) for dv in dvs for c in dv["covers"]}
    # the rewritten (new) dirs are NOT covered by any DV
    new_dirs = [d for d in t._manifest(v) if os.path.realpath(d) not in covered]
    assert new_dirs
    got = {r.k for r in t.read(version=v).collect()}
    assert 10 not in got and 1500 not in got and len(got) == 1998
