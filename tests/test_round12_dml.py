"""Round-12 gates, part 6: predicate DML — UPDATE ... SET ... WHERE and
DELETE WHERE with stats-scoped dir-granular copy-on-write.

Contract under test: provably-unmatched dirs carry BY REFERENCE
(byte-identical files); SQL three-valued semantics (UNKNOWN never
updates/deletes); change-feed rows are exact; appends commute (rebase),
scope-dir rewrites conflict; bucket-key updates re-home rows safely.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    ConcurrentCommitError,
    VersionedTable,
    delete_by_keys,
    delete_where,
    merge_upsert,
    update_where,
)


def _ranged(spark, tmp_path, batches=4, per=100):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    for b in range(batches):
        t.commit(
            spark.createDataFrame(
                [
                    Row(k=b * per + i, v=float(b * per + i), s="base")
                    for i in range(per)
                ]
            ),
            mode="append",
        )
    return t


def _file_bytes(dirs):
    out = {}
    for d in dirs:
        for root, _s, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = open(p, "rb").read()
    return out


def test_update_where_scoped_and_exact(spark, tmp_path):
    t = _ranged(spark, tmp_path)
    base_dirs = t._manifest(4)
    baseline = _file_bytes(base_dirs)
    v = update_where(
        t,
        {"s": "'U'", "v": "v * 2"},
        [("k", "between", (150, 249))],
    )
    manifest = t._manifest(v)
    carried = [d for d in base_dirs if d in manifest]
    assert len(carried) == 2  # ranges 0-99 and 300-399 provably miss
    for p, b in _file_bytes(carried).items():
        assert b == baseline[p]
    rows = {r.k: (r.v, r.s) for r in t.read().collect()}
    assert len(rows) == 400
    for k, (val, s) in rows.items():
        if 150 <= k <= 249:
            assert s == "U" and val == 2.0 * k
        else:
            assert s == "base" and val == float(k)
    # schema/dtypes unchanged (SET result cast back)
    assert dict(t.read().dtypes) == {"k": "bigint", "v": "double", "s": "string"}


def test_delete_where_scoped_and_exact(spark, tmp_path):
    t = _ranged(spark, tmp_path)
    base_dirs = t._manifest(4)
    v = delete_where(t, [("k", "<", 100)])
    manifest = t._manifest(v)
    assert len([d for d in base_dirs if d in manifest]) == 3
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(100, 400))


def test_three_valued_semantics(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [Row(k=1, x=5.0), Row(k=2, x=None), Row(k=3, x=20.0)],
            "k long, x double",
        )
    )
    # DELETE WHERE x > 10: UNKNOWN (NULL x) keeps the row
    delete_where(t, [("x", ">", 10.0)])
    assert {r.k for r in t.read().collect()} == {1, 2}
    # UPDATE WHERE x > 1: NULL x row untouched
    update_where(t, {"x": "x + 1"}, [("x", ">", 1.0)])
    got = {r.k: r.x for r in t.read().collect()}
    assert got == {1: 6.0, 2: None}


def test_update_where_noop_when_unmatchable(spark, tmp_path):
    t = _ranged(spark, tmp_path, batches=2)
    v_before = t.versions()[-1]
    assert update_where(t, {"s": "'X'"}, [("k", ">", 10_000)]) == v_before
    assert t.versions()[-1] == v_before  # no empty commit


def test_predicate_dml_change_feed(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        drain_versioned_cdf,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.set_stats_columns(["k"])
    t.commit(
        spark.createDataFrame(
            [Row(k=i, v=float(i)) for i in range(20)]
        )
    )
    update_where(t, {"v": "v + 100"}, [("k", "<", 3)])
    delete_where(t, [("k", ">=", 18)])
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    ups = {
        (r.k, r.v)
        for r in feed.filter(F.col("_change_type") == "update").collect()
    }
    assert ups == {(0, 100.0), (1, 101.0), (2, 102.0)}  # POST-images
    dels = {
        r.k for r in feed.filter(F.col("_change_type") == "delete").collect()
    }
    assert dels == {18, 19}
    # batch table_changes agrees
    assert t.read_changes_cdf(1).filter(
        F.col("_change_type") == "update"
    ).count() == 3


def test_update_rebases_over_append_conflicts_on_rewrite(
    spark, tmp_path, monkeypatch
):
    t = _ranged(spark, tmp_path)
    other = VersionedTable(spark, t.dir)
    real = VersionedTable._read_dirs
    fired = []

    def racing_read(self, dirs, version):
        out = real(self, dirs, version)
        if self is t and not fired:
            fired.append(True)
            other.commit(
                spark.createDataFrame([Row(k=900, v=0.0, s="late")]),
                mode="append",
            )
        return out

    monkeypatch.setattr(VersionedTable, "_read_dirs", racing_read)
    v = update_where(t, {"s": "'U'"}, [("k", "<", 100)])
    monkeypatch.setattr(VersionedTable, "_read_dirs", real)
    # both landed: the update rebased onto the interloper's append
    rows = {r.k: r.s for r in t.read(version=v).collect()}
    assert rows[900] == "late" and rows[0] == "U" and rows[399] == "base"

    # an interloper REWRITING a scope dir is a hard conflict
    fired.clear()

    def racing_rewrite(self, dirs, version):
        out = real(self, dirs, version)
        if self is t and not fired:
            fired.append(True)
            delete_where(other, [("k", "<", 10)])  # rewrites scope dir
        return out

    monkeypatch.setattr(VersionedTable, "_read_dirs", racing_rewrite)
    with pytest.raises(ConcurrentCommitError):
        update_where(t, {"s": "'V'"}, [("k", "<", 100)])


def test_update_bucket_key_rehomes_rows(spark, tmp_path):
    """Updating a bucket-key column is safe: rewritten rows re-home
    through the layout-aware writer, and keyed lookups/merges find them
    at their NEW bucket."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_layout(["k"], 8)
    t.set_stats_columns(["k"])
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(40)])
    )
    update_where(t, {"k": "k + 1000"}, [("k", "<", 5)])
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(5, 40)) + list(range(1000, 1005))
    # a keyed lookup at the NEW key value finds the row (bucket-pruned)
    hit = t.read_at_keys(
        spark.createDataFrame([Row(k=1003)]), keys=["k"]
    ).collect()
    assert [(r.k, r.v) for r in hit] == [(1003, 3.0)]
    # and a granular merge on the new key updates it in place
    merge_upsert(
        t, spark.createDataFrame([Row(k=1003, v=-1.0)]), keys=["k"]
    )
    assert t.read().filter(F.col("k") == 1003).first().v == -1.0


def test_update_after_dv_materializes_deletions(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    t.commit(spark.createDataFrame([Row(k=i, v=float(i)) for i in range(20)]))
    delete_by_keys(
        t, spark.createDataFrame([Row(k=1)]), keys=["k"], merge_on_read=True
    )
    v = update_where(t, {"v": "v * 10"}, [("k", "<", 100)])
    # the single dir was in scope: its DV materialized, coverage gone
    assert t.deletion_vectors(v) == []
    got = {r.k: r.v for r in t.read().collect()}
    assert 1 not in got and got[2] == 20.0 and len(got) == 19


def test_update_where_on_column_mapped_table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_column_mapping()
    t.set_stats_columns(["k"])
    t.commit(
        spark.createDataFrame([Row(k=i, v=float(i)) for i in range(10)])
    )
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        rename_column,
    )

    rename_column(t, "v", "val")
    update_where(t, {"val": "val + 1"}, [("k", "<", 3)])
    got = {r.k: r.val for r in t.read().collect()}
    assert got[0] == 1.0 and got[2] == 3.0 and got[5] == 5.0


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        ConstraintViolation,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([Row(k=1), Row(k=-5)]))
    with pytest.raises(ConstraintViolation, match="existing rows"):
        t.add_constraint("k >= 0")
    assert t.constraints() == []  # nothing took effect
    delete_where(t, [("k", "<", 0)])
    t.add_constraint("k >= 0")  # now clean: accepted
    assert t.constraints() == ["k >= 0"]
    with pytest.raises(ConstraintViolation):
        t.commit(spark.createDataFrame([Row(k=-1)]), mode="append")


def test_in_predicate_skipping_and_dml(spark, tmp_path):
    """IN joins the predicate grammar everywhere: read_where prunes dirs
    whose range excludes EVERY listed value, delete_where removes
    exactly the listed rows, and the batch DataSource maps pyspark's In
    filter onto the same dir pruning."""
    from weather_etl_docker_airflow_project_spark.sources.versioned_stream import (
        VersionedTableBatchReader,
    )

    t = _ranged(spark, tmp_path)  # 4 dirs: 0-99, ..., 300-399
    df, rep = t.read_where([("k", "in", [5, 7, 350])])
    assert rep.scanned_dirs == 2  # only dirs 0-99 and 300-399 can match
    assert sorted(r.k for r in df.collect()) == [5, 7, 350]
    # empty IN list: no dir can match, zero rows
    df0, rep0 = t.read_where([("k", "in", [])])
    assert rep0.scanned_dirs == 0 and df0.count() == 0
    # batch source: pyspark's In filter prunes planning (checked before
    # any DML widens a rewritten dir's key span)
    from pyspark.sql.datasource import In

    reader = VersionedTableBatchReader(
        t.snapshot_schema(t.versions()[-1]), {"tabledir": t.dir}
    )
    list(reader.pushFilters([In(("k",), (120, 130))]))
    dirs = {os.path.dirname(p.path) for p in reader.partitions() if p.path}
    assert len(dirs) == 1
    # DML with IN
    v = delete_where(t, [("k", "in", [5, 350, 9999])])
    assert len(set(t._manifest(4)) & set(t._manifest(v))) == 2
    got = {r.k for r in t.read().collect()}
    assert 5 not in got and 350 not in got and len(got) == 398
    update_where(t, {"s": "'I'"}, [("k", "in", [7])])
    assert t.read().filter(F.col("s") == "I").count() == 1
