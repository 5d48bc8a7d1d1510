"""Round-12 gates, part 4: the materialized CHANGE DATA FEED and its
streaming source (t23 — Delta's ``readChangeFeed`` streaming).

Contract under test:
- MERGE splits its source into update/insert feed rows; DELETE emits
  the rows actually removed (COW and deletion-vector modes both);
- pure appends stream as synthesized inserts (no cdf file written);
- compact/zorder commits are skipped (dataChange=false);
- a row-changing commit with no recorded feed raises;
- the drained feed REPLAYS to the exact final snapshot;
- checkpoint restart is exactly-once;
- vacuum never retires a retained version's cdf dir.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    cluster_rewrite,
    compact,
    delete_by_keys,
    merge_upsert,
    vacuum,
)
from weather_etl_docker_airflow_project_spark.streaming.windows import (
    drain_versioned_cdf,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _cdf_table(spark, tmp_path, n=40, buckets=8):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.set_layout(["k"], buckets)
    t.commit(_mk(spark, [(i, f"v{i}") for i in range(n)]))
    return t


def test_merge_feed_splits_update_insert(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    merge_upsert(
        t, _mk(spark, [(1, "U"), (2, "U"), (100, "I")]), keys=["k"]
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    rows = feed.filter(F.col("_commit_version") == 2).collect()
    got = {(r.k, r._change_type) for r in rows}
    assert got == {(1, "update"), (2, "update"), (100, "insert")}
    # v1's append streamed as synthesized inserts
    v1 = feed.filter(F.col("_commit_version") == 1)
    assert v1.count() == 40
    assert v1.select("_change_type").distinct().collect() == [
        Row(_change_type="insert")
    ]


def test_delete_feed_emits_only_present_rows(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    delete_by_keys(
        t,
        spark.createDataFrame([Row(k=3), Row(k=999)]),  # 999 absent
        keys=["k"],
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    dels = feed.filter(F.col("_change_type") == "delete").collect()
    assert [(r.k, r.v) for r in dels] == [(3, "v3")]


def test_dv_delete_writes_feed(spark, tmp_path):
    t = _cdf_table(spark, tmp_path)
    delete_by_keys(
        t,
        spark.createDataFrame([Row(k=5), Row(k=7)]),
        keys=["k"],
        merge_on_read=True,
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    dels = sorted(
        (r.k, r.v)
        for r in feed.filter(F.col("_change_type") == "delete").collect()
    )
    assert dels == [(5, "v5"), (7, "v7")]


def test_conditional_merge_feed_only_fired_updates(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.set_layout(["k"], 4)
    t.commit(spark.createDataFrame([(1, 10), (2, 20)], "k long, n long"))
    merge_upsert(
        t,
        spark.createDataFrame([(1, 5), (2, 99), (3, 1)], "k long, n long"),
        keys=["k"],
        when_matched_condition="s.n > t.n",
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    got = {
        (r.k, r._change_type)
        for r in feed.filter(F.col("_commit_version") == 2).collect()
    }
    # 1: condition false -> NO feed row; 2: update; 3: insert
    assert got == {(2, "update"), (3, "insert")}


def test_compact_and_zorder_skipped_overwrite_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.enable_change_data_feed()
    t.commit(
        spark.createDataFrame([Row(k=i, x=float(i % 7)) for i in range(100)])
    )
    compact(t)
    cluster_rewrite(t, ["x"], n_chunks=2, bits=4)
    t.commit(
        spark.createDataFrame([Row(k=1000 + i, x=0.0) for i in range(5)]),
        mode="append",
    )
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    # compact + zorder contributed nothing; both appends streamed
    assert feed.count() == 105
    assert feed.select("_commit_version").distinct().count() == 2
    # an OVERWRITE has no recorded feed: the stream must refuse
    t.commit(
        spark.createDataFrame([Row(k=0, x=0.0)]), mode="overwrite"
    )
    with pytest.raises(Exception, match="no change data feed"):
        drain_versioned_cdf(spark, t, per_batch=0)


def test_feed_replays_to_exact_final_snapshot(spark, tmp_path):
    """The done-criterion: draining a mixed append/merge/delete history
    and applying the feed (last change per key wins, deletes drop)
    reconstructs the final replica state exactly."""
    t = _cdf_table(spark, tmp_path, n=60)
    merge_upsert(
        t, _mk(spark, [(2, "U2"), (200, "I200"), (201, "I201")]), keys=["k"]
    )
    delete_by_keys(
        t, spark.createDataFrame([Row(k=4), Row(k=200)]), keys=["k"]
    )
    t.commit(_mk(spark, [(300 + i, "A") for i in range(5)]), mode="append")
    merge_upsert(t, _mk(spark, [(301, "U301"), (5, "U5")]), keys=["k"])
    feed, n_batches = drain_versioned_cdf(spark, t, per_batch=1)
    assert n_batches >= 4  # paced: one commit per micro-batch
    last = Window.partitionBy("k").orderBy(F.col("_commit_version").desc())
    replica = (
        feed.withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_change_type") != "delete")
        .select("k", "v")
    )
    got = sorted((r.k, r.v) for r in replica.collect())
    want = sorted((r.k, r.v) for r in t.read().collect())
    assert got == want


def test_cdf_restart_is_exactly_once(spark, tmp_path):
    """Checkpoint-restart on the CDF stream: stop mid-drain, restart
    from the same checkpoint, land every feed row exactly once."""
    import json as _json
    import time

    from weather_etl_docker_airflow_project_spark.sources import (
        versioned_stream,
    )

    t = _cdf_table(spark, tmp_path, n=50)
    merge_upsert(t, _mk(spark, [(1, "U"), (90, "I")]), keys=["k"])
    delete_by_keys(t, spark.createDataFrame([Row(k=2)]), keys=["k"])
    t.commit(_mk(spark, [(100 + i, "A") for i in range(10)]), mode="append")
    merge_upsert(t, _mk(spark, [(3, "U3")]), keys=["k"])
    target = t.versions()[-1]
    versioned_stream.register(spark)
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def start():
        stream = (
            spark.readStream.format("versioned_cdf_stream")
            .option("tableDir", t.dir)
            .option("maxVersionsPerBatch", "1")
            .option("paceStateDir", os.path.join(ck, "pace"))
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q1 = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q1.recentProgress):
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)

    q2 = start()
    deadline = time.time() + 180
    done = False
    while time.time() < deadline:
        lp = q2.lastProgress
        if lp and lp.get("sources"):
            eo = lp["sources"][0].get("endOffset")
            if eo is not None:
                if isinstance(eo, str):
                    try:
                        eo = _json.loads(eo)
                    except ValueError:
                        import ast

                        eo = ast.literal_eval(eo)
                if eo["version"] >= target:
                    done = True
                    break
        time.sleep(0.1)
    assert done, "restarted CDF stream did not catch up"
    q2.stop()
    q2.awaitTermination(60)
    out = spark.read.parquet(sink)
    # expected: 50 inserts (v1) + 2 merge rows (v2) + 1 delete (v3)
    # + 10 inserts (v4) + 1 update (v5) = 64, each exactly once
    assert out.count() == 64
    assert (
        out.groupBy("k", "_commit_version")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )


def test_vacuum_keeps_retained_cdf_dirs(spark, tmp_path):
    t = _cdf_table(spark, tmp_path, n=30)
    merge_upsert(t, _mk(spark, [(1, "U")]), keys=["k"])
    t.commit(_mk(spark, [(500, "A")]), mode="append")
    cdf_v2 = t.cdf_path(2)
    assert cdf_v2 is not None
    vacuum(t, retain_versions=3)  # keeps everything: full feed drains
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    assert feed.count() == 32  # 30 inserts + 1 update + 1 append insert
    vacuum(t, retain_versions=2)  # v1 retired
    assert os.path.isdir(cdf_v2), "retained version's cdf dir vacuumed"
    # a from-the-beginning feed is now INCOMPLETE and must refuse...
    with pytest.raises(Exception, match="history before"):
        drain_versioned_cdf(spark, t, per_batch=0)
    # ...while a feed from a surviving offset still drains
    feed, _ = drain_versioned_cdf(spark, t, per_batch=1, starting_version=2)
    assert [
        (r.k, r._change_type) for r in feed.collect()
    ] == [(500, "insert")]


def test_stream_replication_and_replay_idempotence(spark, tmp_path):
    """End-to-end stream replication lands the exact source snapshot,
    and RE-APPLYING a delivered batch (foreachBatch's at-least-once
    case) leaves the replica unchanged — the convergence contract the
    full-payload feed exists for."""
    from weather_etl_docker_airflow_project_spark.streaming.windows import (
        stream_replicate_cdf,
    )

    src_t = _cdf_table(spark, tmp_path, n=40)
    merge_upsert(src_t, _mk(spark, [(1, "U"), (80, "I")]), keys=["k"])
    delete_by_keys(src_t, spark.createDataFrame([Row(k=2)]), keys=["k"])
    replica = VersionedTable(spark, str(tmp_path / "replica"))
    replica.set_layout(["k"], 8)
    replica.commit(_mk(spark, []).limit(0))
    _v, n_batches = stream_replicate_cdf(
        spark, src_t, replica, keys=["k"], per_batch=1
    )
    assert n_batches >= 3
    want = sorted((r.k, r.v) for r in src_t.read().collect())
    assert sorted((r.k, r.v) for r in replica.read().collect()) == want
    # replay the merge commit's feed rows — snapshot must not change
    feed, _ = drain_versioned_cdf(spark, src_t, per_batch=0)
    merge_rows = feed.filter(
        (F.col("_commit_version") == 2)
        & F.col("_change_type").isin("insert", "update")
    ).drop("_change_type", "_commit_version")
    merge_upsert(replica, merge_rows, keys=["k"])
    delete_by_keys(
        replica,
        feed.filter(F.col("_change_type") == "delete").select("k"),
        keys=["k"],
    )
    assert sorted((r.k, r.v) for r in replica.read().collect()) == want


def test_batch_read_changes_cdf_matches_stream(spark, tmp_path):
    """table_changes (batch) over a mixed history returns exactly the
    streamed feed — same rows, same change types, same versions."""
    t = _cdf_table(spark, tmp_path, n=30)
    merge_upsert(t, _mk(spark, [(1, "U"), (60, "I")]), keys=["k"])
    delete_by_keys(t, spark.createDataFrame([Row(k=2)]), keys=["k"])
    compact(t)  # dataChange=false: contributes nothing
    t.commit(_mk(spark, [(100, "A")]), mode="append")
    batch = t.read_changes_cdf(0)
    streamed, _ = drain_versioned_cdf(spark, t, per_batch=1)
    key = lambda r: (r.k, r._change_type, r._commit_version)  # noqa: E731
    assert sorted(map(key, batch.collect())) == sorted(
        map(key, streamed.collect())
    )
    # range scoping: only the delete commit
    only_del = t.read_changes_cdf(2, 3).collect()
    assert [(r.k, r._change_type) for r in only_del] == [(2, "delete")]


def test_batch_read_changes_cdf_refuses_feedless_rewrite(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))  # CDF never enabled
    t.commit(_mk(spark, [(i, "v") for i in range(10)]))
    merge_upsert(t, _mk(spark, [(1, "U")]), keys=["k"])
    with pytest.raises(ValueError, match="no change data feed"):
        t.read_changes_cdf(0)


def test_dv_delete_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """A merge-on-read DELETE losing its CAS race to a pure APPEND
    auto-rebases: coverage stays scoped to the base dirs, so the
    appended rows survive (delete-as-of-read) and both commits land."""
    t = _cdf_table(spark, tmp_path, n=20)
    other = VersionedTable(spark, t.dir)
    real = VersionedTable.snapshot_schema
    fired = []

    def racing_schema(self, version):
        out = real(self, version)
        if not fired and self is t:
            fired.append(True)
            other.commit(_mk(spark, [(500, "A"), (5, "DUP")]), mode="append")
        return out

    monkeypatch.setattr(VersionedTable, "snapshot_schema", racing_schema)
    delete_by_keys(
        t,
        spark.createDataFrame([Row(k=5), Row(k=6)]),
        keys=["k"],
        merge_on_read=True,
    )
    monkeypatch.setattr(VersionedTable, "snapshot_schema", real)
    snap = {(r.k, r.v) for r in t.read().collect()}
    # base rows 5,6 deleted; the interloper's append — INCLUDING its
    # k=5 row, which landed in an uncovered dir — survives
    assert (5, "v5") not in snap and (6, "v6") not in snap
    assert (500, "A") in snap and (5, "DUP") in snap
    assert len(snap) == 20  # 20 - 2 deleted + 2 appended


def test_dv_delete_conflict_with_rewrite_raises(spark, tmp_path, monkeypatch):
    """An interloper that REWROTE base dirs (granular merge) read them
    without our pending vector — rebasing would resurrect the deletes;
    must raise."""
    t = _cdf_table(spark, tmp_path, n=20)
    other = VersionedTable(spark, t.dir)
    real = VersionedTable.snapshot_schema
    fired = []

    def racing_schema(self, version):
        out = real(self, version)
        if not fired and self is t:
            fired.append(True)
            merge_upsert(other, _mk(spark, [(7, "REWRITTEN")]), keys=["k"])
        return out

    monkeypatch.setattr(VersionedTable, "snapshot_schema", racing_schema)
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        ConcurrentCommitError,
    )

    with pytest.raises(ConcurrentCommitError):
        delete_by_keys(
            t,
            spark.createDataFrame([Row(k=5)]),
            keys=["k"],
            merge_on_read=True,
        )


def test_rebased_merge_keeps_correct_feed(spark, tmp_path, monkeypatch):
    """A merge that auto-rebases over a disjoint-bucket interloper must
    publish a feed describing ITS OWN changes (computed against its
    base — still exact, the interloper touched disjoint buckets)."""
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        _bucket_column,
    )

    t = _cdf_table(spark, tmp_path, n=32, buckets=8)
    other = VersionedTable(spark, t.dir)
    b1 = (
        spark.createDataFrame([(1,)], "k long")
        .select(_bucket_column(["k"], 8).alias("b"))
        .first()
        .b
    )
    diff = next(
        r.k
        for r in spark.range(9000, 9100)
        .select(F.col("id").alias("k"), _bucket_column(["k"], 8).alias("b"))
        .collect()
        if r.b != b1
    )
    real_read = t.read

    def read_once(version=None):
        monkeypatch.setattr(t, "read", real_read)
        merge_upsert(other, _mk(spark, [(diff, "B")]), keys=["k"])
        return real_read(version=version)

    monkeypatch.setattr(t, "read", read_once)
    merge_upsert(t, _mk(spark, [(1, "A"), (800, "NEW")]), keys=["k"])
    # both merges carry their own exact feed
    feed = t.read_changes_cdf(1).collect()
    got = {(r.k, r._change_type, r._commit_version) for r in feed}
    assert (diff, "insert", 2) in got
    assert (1, "update", 3) in got and (800, "insert", 3) in got
    assert len(got) == 3


def test_vacuum_reclaims_dropped_versions_cdf_dirs(spark, tmp_path):
    t = _cdf_table(spark, tmp_path, n=20)
    merge_upsert(t, _mk(spark, [(1, "U")]), keys=["k"])  # v2: cdf dir
    cdf_v2 = t.cdf_path(2)
    compact(t)  # v3
    t.commit(_mk(spark, [(500, "A")]), mode="append")  # v4
    vacuum(t, retain_versions=1)  # only v4 survives
    assert not os.path.exists(cdf_v2), "dropped version's cdf dir leaked"
