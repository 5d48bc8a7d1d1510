"""Round-11d gates: COLUMN MAPPING (Delta's columnMapping=name mode) —
physical-name writes, metadata-only RENAME/DROP COLUMN, id-reuse
protection, and the guard rails around name-keyed semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    delete_by_keys,
    drop_column,
    merge_upsert,
    rename_column,
)


def _mapped(spark, tmp_path, n=50):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.commit(
        spark.createDataFrame(
            [(i, f"v{i}", float(i)) for i in range(n)],
            "k bigint, name string, score double",
        )
    )
    return t


def _physical_names(t, version=1):
    import pyarrow.parquet as pq

    d = t._manifest(version)[0]
    f = next(
        os.path.join(r, x)
        for r, _s, fs in os.walk(d)
        for x in sorted(fs)
        if x.endswith(".parquet")
    )
    return pq.read_schema(f).names


def test_mapped_table_writes_physical_names(spark, tmp_path):
    t = _mapped(spark, tmp_path)
    assert _physical_names(t) == ["col_1", "col_2", "col_3"]
    assert t.read().columns == ["k", "name", "score"]
    assert t.read().count() == 50


def test_rename_is_metadata_only(spark, tmp_path):
    t = _mapped(spark, tmp_path)
    n_dirs = len(os.listdir(t._data))
    v = rename_column(t, "name", "title")
    assert v == 2
    assert len(os.listdir(t._data)) == n_dirs  # zero data writes
    assert t._manifest(2) == t._manifest(1)
    assert t.read().columns == ["k", "title", "score"]
    assert t.read(version=1).columns == ["k", "name", "score"]  # time travel
    assert t.read().orderBy("k").first().title == "v0"


def test_drop_hides_data_and_never_resurrects(spark, tmp_path):
    t = _mapped(spark, tmp_path)
    drop_column(t, "score")
    assert t.read().columns == ["k", "name"]
    # re-added logical name gets a FRESH physical id: old values stay gone
    t.commit(
        spark.createDataFrame(
            [(900, "new", 9.0)], "k bigint, name string, score double"
        ),
        mode="append",
        allow_schema_evolution=True,
    )
    old = t.read().filter(F.col("k") < 50).select("score").distinct().collect()
    assert [r.score for r in old] == [None]
    assert t.read().filter("k = 900").first().score == 9.0
    # the new batch's files use a never-before-used physical id
    assert t.column_mapping(3)["score"] not in ("col_1", "col_2", "col_3")


def test_mapping_requires_pre_first_commit(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1,)], "k bigint"))
    with pytest.raises(ValueError, match="before the first commit"):
        t.enable_column_mapping()
    with pytest.raises(ValueError, match="needs column mapping"):
        rename_column(t, "k", "kk")


def test_rename_refused_on_constraint_or_dv_reference(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.set_constraints(["score >= 0"])
    t.commit(
        spark.createDataFrame([(1, 1.0)], "k bigint, score double")
    )
    with pytest.raises(ValueError, match="constraint"):
        rename_column(t, "score", "s2")
    t.set_constraints([])
    delete_by_keys(
        t, spark.createDataFrame([Row(k=1)]), keys=["k"], merge_on_read=True
    )
    with pytest.raises(ValueError, match="deletion vector"):
        rename_column(t, "k", "key")


def test_mapped_stats_pruning_and_granular_merge(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.set_layout(["k"], 8)
    t.set_stats_columns(["k"])
    t.commit(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k bigint, v string"
        )
    )
    t.commit(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100, 200)], "k bigint, v string"
        ),
        mode="append",
    )
    # stats recorded under LOGICAL names, pruning works through the map
    df, rep = t.read_where([("k", "<", 50)])
    assert rep.scanned_dirs < rep.total_dirs and df.count() == 50
    # granular merge on a mapped+bucketed table
    merge_upsert(
        t, spark.createDataFrame([(5, "UPD")], "k bigint, v string"), keys=["k"]
    )
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows[5] == "UPD" and len(rows) == 200
    # rename of the BUCKET KEY updates the layout and stays granular-safe
    rename_column(t, "k", "key")
    assert t.layout()["bucket_keys"] == ["key"]
    merge_upsert(
        t,
        spark.createDataFrame([(7, "UPD2")], "key bigint, v string"),
        keys=["key"],
    )
    assert t.read().filter("key = 7").first().v == "UPD2"
    assert t.read().count() == 200


def test_cluster_rewrite_on_mapped_table(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        cluster_rewrite,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.set_stats_columns(["x", "y"])
    df = spark.range(0, 5000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
    )
    t.commit(df)
    cluster_rewrite(t, ["x", "y"], n_chunks=8, bits=5)
    assert t.read().columns == ["x", "y"]
    assert t.read().count() == 5000
    out, rep = t.read_where([("x", "between", (10, 20))])
    assert rep.scanned_dirs < rep.total_dirs
    assert out.count() == df.filter(F.col("x").between(10, 20)).count()
    # physical names on the z-chunk files too
    import pyarrow.parquet as pq

    d = t._manifest(2)[0]
    f = next(
        os.path.join(r, x)
        for r, _s, fs in os.walk(d)
        for x in sorted(fs)
        if x.endswith(".parquet")
    )
    assert pq.read_schema(f).names == ["col_1", "col_2"]


def test_stream_source_on_mapped_table(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        drain_versioned_source,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.commit(spark.createDataFrame([(i, f"v{i}") for i in range(30)], "k bigint, name string"))
    rename_column(t, "name", "title")
    t.commit(
        spark.createDataFrame([(i, f"v{i}") for i in range(30, 60)], "k bigint, title string"),
        mode="append",
    )
    drained, _ = drain_versioned_source(spark, t, per_batch=0)
    assert drained.columns == ["k", "title"]
    got = sorted((r.k, r.title) for r in drained.collect())
    assert got == [(i, f"v{i}") for i in range(60)]


def test_history_records_operations(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        clone,
        compact,
        drop_column,
        restore,
    )

    t = _mapped(spark, tmp_path)
    merge_upsert(
        t,
        spark.createDataFrame(
            [(0, "upd", 0.0)], "k bigint, name string, score double"
        ),
        keys=["k"],
    )
    drop_column(t, "score")
    compact(t)
    restore(t, 1)
    c = clone(t, str(tmp_path / "c"))
    ops = [h["op"] for h in t.history()]
    assert ops == ["append", "merge", "drop_column", "compact", "restore (to v1)"]
    assert [h["n_cols"] for h in t.history()] == [3, 3, 2, 2, 3]
    assert c.history()[0]["op"] == "clone (of v5)"
    ts = [h["ts"] for h in t.history()]
    assert ts == sorted(ts)


def test_identity_commit_monotone_and_dense(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        commit_with_identity,
        identity_high_water,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    b1 = spark.createDataFrame([(i * 7, f"a{i}") for i in range(40)], "ek long, v string")
    b2 = spark.createDataFrame([(i * 3, f"b{i}") for i in range(25)], "ek long, v string")
    commit_with_identity(t, b1, "row_id", ["ek"])
    assert identity_high_water(t, "row_id") == 40
    # an interleaved PLAIN commit must not disturb the high-water mark
    t.commit(
        spark.createDataFrame([(99, -1, "plain")], "row_id long, ek long, v string"),
        mode="append",
    )
    commit_with_identity(t, b2, "row_id", ["ek"], mode="append")
    assert identity_high_water(t, "row_id") == 65
    ids = [r.row_id for r in t.read().filter("v <> 'plain'").orderBy("row_id").collect()]
    assert ids == list(range(1, 66))  # dense, unique, monotone
    # deterministic order: batch-2 ids follow ek order offset by hwm
    got = {(r.ek, r.row_id) for r in t.read().filter("v like 'b%'").collect()}
    assert got == {(i * 3, 41 + i) for i in range(25)}
    with pytest.raises(ValueError, match="already present"):
        commit_with_identity(
            t,
            spark.createDataFrame([(1, 2, "x")], "row_id long, ek long, v string"),
            "row_id",
            ["ek"],
            mode="append",
        )
    with pytest.raises(ValueError, match="identity column is"):
        identity_high_water(t, "other_id")


def test_cdc_on_mapped_table_and_across_rename(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        rename_column,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.commit(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k bigint, name string"
        )
    )
    # append leg on a mapped table (raw physical files, logical keys)
    t.commit(
        spark.createDataFrame([(100, "x")], "k bigint, name string"),
        mode="append",
    )
    feed = t.read_changes_cdc(1, 2, keys=["k"])
    got = {(r.k, r.change_type) for r in feed.collect()}
    assert got == {(100, "insert")}
    # rename, then change a value: the range straddling the rename must
    # still report the update on the renamed column
    rename_column(t, "name", "title")
    t.commit(
        spark.createDataFrame(
            [(i, "CHANGED" if i == 5 else f"v{i}") for i in range(20)]
            + [(100, "x")],
            "k bigint, title string",
        ),
        mode="overwrite",
    )
    feed2 = t.read_changes_cdc(2, 4, keys=["k"])
    got2 = {(r.k, r.change_type) for r in feed2.collect()}
    assert (5, "update") in got2
    assert not any(ct == "update" for k, ct in got2 if k != 5)


def test_file_level_read_changes_on_mapped_table(spark, tmp_path):
    t = _mapped(spark, tmp_path, n=10)
    t.commit(
        spark.createDataFrame(
            [(50, "new", 5.0)], "k bigint, name string, score double"
        ),
        mode="append",
    )
    delta = t.read_changes(1, 2)
    assert delta.columns == ["k", "name", "score"]  # logical names
    assert [r.k for r in delta.collect()] == [50]


def test_identity_composes_with_mapping_and_layout(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        commit_with_identity,
        identity_high_water,
        merge_upsert,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.set_layout(["ek"], 4)
    b1 = spark.createDataFrame([(i, f"a{i}") for i in range(30)], "ek long, v string")
    commit_with_identity(t, b1, "row_id", ["ek"])
    assert t.read().columns == ["row_id", "ek", "v"]
    assert _physical_names(t)[0:1] == ["col_1"]  # row_id mapped too
    commit_with_identity(
        t,
        spark.createDataFrame([(100, "b")], "ek long, v string"),
        "row_id",
        ["ek"],
        mode="append",
    )
    assert identity_high_water(t, "row_id") == 31
    ids = sorted(r.row_id for r in t.read().collect())
    assert ids == list(range(1, 32))
    # a granular merge between identity commits stays transparent
    merge_upsert(
        t,
        spark.createDataFrame([(31, 5, "UPD")], "row_id long, ek long, v string"),
        keys=["ek"],
    )
    assert identity_high_water(t, "row_id") == 31
    commit_with_identity(
        t,
        spark.createDataFrame([(200, "c")], "ek long, v string"),
        "row_id",
        ["ek"],
        mode="append",
    )
    assert identity_high_water(t, "row_id") == 32


def test_merge_with_schema_evolution(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 4)
    t.commit(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k bigint, v string"
        )
    )
    src = spark.createDataFrame(
        [(5, "UPD", 1.5), (100, "NEW", 2.5)], "k bigint, v string, score double"
    )
    # unflagged: additive source columns are refused
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        merge_upsert(t, src, keys=["k"])
    merge_upsert(t, src, keys=["k"], allow_schema_evolution=True)
    out = t.read()
    assert out.columns == ["k", "v", "score"]
    rows = {r.k: (r.v, r.score) for r in out.collect()}
    assert rows[5] == ("UPD", 1.5) and rows[100] == ("NEW", 2.5)
    # carried rows (untouched buckets, old files) null-fill the new col
    assert rows[7] == ("v7", None)
    assert len(rows) == 21
    # conditional merge with evolution
    src2 = spark.createDataFrame(
        [(5, "STALE", 0.5, 1), (6, "FRESH", 9.9, 1)],
        "k bigint, v string, score double, gen int",
    )
    merge_upsert(
        t,
        src2.withColumn("score", F.col("score")),
        keys=["k"],
        when_matched_condition="s.score > coalesce(t.score, 0.0)",
        allow_schema_evolution=True,
    )
    rows2 = {r.k: (r.v, r.score, r.gen) for r in t.read().collect()}
    assert rows2[5] == ("UPD", 1.5, None)  # stale update rejected
    assert rows2[6] == ("FRESH", 9.9, 1)


def test_vacuum_retain_hours_and_dry_run(spark, tmp_path):
    import os as _os

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        vacuum,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    for lo in (0, 10, 20):
        t.commit(
            spark.createDataFrame([(lo, "x")], "k bigint, v string"),
            mode="overwrite",
        )
    # all commits are seconds old: a 1-hour window keeps everything
    rep = vacuum(t, retain_versions=1, retain_hours=1.0)
    assert rep.dropped_versions == [] and rep.removed_dirs == []
    assert t.versions() == [1, 2, 3]
    # dry run: reports the drop set, touches nothing
    rep2 = vacuum(t, retain_versions=1, dry_run=True)
    assert rep2.dropped_versions == [1, 2] and len(rep2.removed_dirs) == 2
    assert t.versions() == [1, 2, 3]
    assert all(_os.path.isdir(d) for d in rep2.removed_dirs)
    # live run removes exactly what the dry run promised
    rep3 = vacuum(t, retain_versions=1)
    assert sorted(rep3.removed_dirs) == sorted(rep2.removed_dirs)
    assert t.versions() == [3]
