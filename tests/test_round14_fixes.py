"""Round-14 regression gates: the ADVICE.md fixes — multi-app
exactly-once watermarks surviving vacuum (a carried ``#sbatch`` line
must be read past another app's own marker), plain-decimal float
parameter binding in the SQL statement front, and the parsed-manifest
cache (parse-once semantics + stamp invalidation on table recreate)."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
)
from weather_etl_docker_airflow_project_spark.sources.versioned_sink import (
    VersionedTableStreamWriter,
)


def _task_batches(spark, t, rows):
    from pyspark.sql.pandas.types import to_arrow_schema

    asch = to_arrow_schema(t.snapshot_schema(t.versions()[-1]))
    return iter(
        [
            pa.record_batch(
                [pa.array(c, type=f.type) for c, f in zip(rows, asch)],
                schema=asch,
            )
        ]
    )


def test_multi_app_sbatch_carry_survives_vacuum(spark, tmp_path):
    """ADVICE r13 (high): with TWO streaming apps writing one table,
    app B's manifests carry app A's newest ``#sbatch`` marker as a
    LATER header line (after B's own). Once vacuum drops A's own
    marker-bearing manifest, that carried line is the only surviving
    copy — the watermark scan must read past B's line to find it, or a
    crash-redelivered micro-batch of A appends twice."""
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        vacuum,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    )
    wa = VersionedTableStreamWriter(
        t.snapshot_schema(1), {"tabledir": t.dir, "txnappid": "qA"}, False
    )
    wb = VersionedTableStreamWriter(
        t.snapshot_schema(1), {"tabledir": t.dir, "txnappid": "qB"}, False
    )
    # v2: app A's batch 7 (its own marker line)
    wa.commit([wa.write(_task_batches(spark, t, [[100], [2.0]]))], 7)
    # v3, v4: app B's batches — B's own marker first, A's carried after
    wb.commit([wb.write(_task_batches(spark, t, [[200], [3.0]]))], 0)
    wb.commit([wb.write(_task_batches(spark, t, [[201], [3.0]]))], 1)
    assert t.read().count() == 8
    # retention drops v2 (A's own marker manifest); only B-published
    # manifests survive, each carrying A's marker as a non-first line
    vacuum(t, retain_versions=1, staged_grace_seconds=0)
    assert t.versions() == [4]
    assert wa._newest_stream_batch_id(t) == 7
    assert wb._newest_stream_batch_id(t) == 1
    # crash-style redelivery of A's batch 7: must be a no-op
    wa.commit([wa.write(_task_batches(spark, t, [[100], [2.0]]))], 7)
    assert t.read().filter("k = 100").count() == 1
    # restart of app B past its own marker-bearing manifests: batch 1
    # redelivery no-op, batch 2 lands
    wb.commit([wb.write(_task_batches(spark, t, [[201], [3.0]]))], 1)
    assert t.read().filter("k = 201").count() == 1
    wb.commit([wb.write(_task_batches(spark, t, [[202], [3.0]]))], 2)
    assert t.read().filter("k = 202").count() == 1


def test_float_params_bind_in_plain_decimal(spark, tmp_path):
    """ADVICE r13 (low): float params rendered via repr() yield
    exponent notation (1e-05) the predicate tokenizer cannot parse;
    non-finite floats rendered as bare words. Now: plain decimal at any
    magnitude, loud refusal for inf/nan."""
    from weather_etl_docker_airflow_project_spark.operators.dml_sql import (
        _render_literal,
        engine_sql,
    )

    assert _render_literal(1e-05) == "0.00001"
    assert float(_render_literal(1.23456789e-07)) == 1.23456789e-07
    assert "e" not in _render_literal(1e300).lower()
    assert _render_literal(-0.5) == "-0.5"
    assert _render_literal(3.0) == "3.0"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            _render_literal(bad)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 1e-05).alias("v")
        )
    )
    res = engine_sql(
        spark,
        f"DELETE FROM '{t.dir}' WHERE v < :eps",
        params={"eps": 3e-05},
    )
    assert res.collect()[0].op == "delete"
    assert t.read().count() == 7


def test_manifest_parse_is_cached_per_stamp(spark, tmp_path):
    """The parsed-manifest cache: repeated header accessors on an
    immutable manifest parse the file once; recreating the table at the
    SAME path (fresh stamp) must never serve the stale parse."""
    import weather_etl_docker_airflow_project_spark.operators.versioned as V

    tdir = str(tmp_path / "t")
    t = VersionedTable(spark, tdir)
    t.commit(spark.range(4).select(F.col("id").alias("k")))
    calls = {"n": 0}
    real = V._parse_manifest

    def counting(path):
        calls["n"] += 1
        return real(path)

    V._parse_manifest = counting
    try:
        t2 = VersionedTable(spark, tdir)  # fresh instance, shared cache
        t2.read()  # warms (or hits) the cache
        before = calls["n"]
        for _ in range(3):
            assert t2.snapshot_schema(1) is not None
            assert t2.commit_op(1) == "append"
            assert t2.deletion_vectors(1) == []
            assert t2.position_dvs(1) == []
            assert t2._manifest(1)
            t2.commit_timestamp(1)
        assert calls["n"] == before  # zero re-parses
        # accessors return copies: mutating one must not poison the next
        m = t2._manifest(1)
        m.append("bogus")
        assert "bogus" not in t2._manifest(1)
        # recreate the table at the same path: new stamp, fresh parse
        shutil.rmtree(tdir)
        t3 = VersionedTable(spark, tdir)
        t3.commit(
            spark.range(2).select(F.col("id").alias("x")), op="rebuilt"
        )
        assert t3.commit_op(1) == "rebuilt"
        assert [f.name for f in t3.snapshot_schema(1).fields] == ["x"]
    finally:
        V._parse_manifest = real


def test_manifest_cache_eviction_keeps_serving(spark, tmp_path):
    """FIFO eviction past the cache bound must stay correct (re-parse,
    not KeyError/stale)."""
    import weather_etl_docker_airflow_project_spark.operators.versioned as V

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(3).select(F.col("id").alias("k")))
    t.commit(spark.range(3).select(F.col("id").alias("k")), mode="append")
    old_max = V._MANIFEST_CACHE_MAX
    V._MANIFEST_CACHE_MAX = 1
    try:
        assert t.commit_op(1) == "append"
        assert t.commit_op(2) == "append"  # evicts v1
        assert len(t._manifest(1)) == 1  # re-parsed, still right
        assert len(t._manifest(2)) == 2
        assert len(V._MANIFEST_CACHE) <= 1
    finally:
        V._MANIFEST_CACHE_MAX = old_max


def test_sql_insert_and_ctas(spark, tmp_path):
    """Round-14 verdict item 6: the SQL statement front's write half —
    CREATE VERSIONED TABLE AS / INSERT INTO / INSERT OVERWRITE lower
    onto the commit protocol (constraints, CAS, history all apply)."""
    from weather_etl_docker_airflow_project_spark.operators.dml_sql import (
        engine_sql,
    )

    tdir = str(tmp_path / "t")
    spark.range(10).selectExpr(
        "id AS k", "CAST(id * 2 AS STRING) AS v"
    ).createOrReplaceTempView("src14")
    # INSERT into a never-created table refuses loudly
    with pytest.raises(ValueError, match="has no commits"):
        engine_sql(spark, f"INSERT INTO VERSIONED '{tdir}' SELECT * FROM src14")
    r = engine_sql(
        spark,
        f"CREATE VERSIONED TABLE '{tdir}' AS SELECT * FROM src14 WHERE k < 5",
    ).collect()[0]
    assert (r.op, r.version) == ("create_table_as", 1)
    t = VersionedTable(spark, tdir)
    assert t.read().count() == 5
    # CTAS on an existing table refuses
    with pytest.raises(ValueError, match="already has commits"):
        engine_sql(spark, f"CREATE VERSIONED TABLE '{tdir}' AS SELECT 1 AS k")
    r = engine_sql(
        spark,
        f"INSERT INTO VERSIONED '{tdir}' SELECT * FROM src14 WHERE k >= :lo",
        params={"lo": 5},
    ).collect()[0]
    assert (r.op, r.version) == ("insert_append", 2)
    assert t.read().count() == 10
    # injection safety (P12): a hostile string param stays a literal —
    # it can never splice a second statement or a path
    evil = "x' ; DELETE FROM '" + tdir
    r = engine_sql(
        spark,
        f"INSERT INTO VERSIONED '{tdir}' "
        "SELECT CAST(99 AS BIGINT) AS k, :tag AS v",
        params={"tag": evil},
    ).collect()[0]
    assert r.op == "insert_append"
    got = t.read().filter("k = 99").collect()
    assert len(got) == 1 and got[0].v == evil
    assert t.read().count() == 11  # nothing was deleted
    # INSERT OVERWRITE replaces the snapshot; history stays readable
    r = engine_sql(
        spark,
        f"INSERT OVERWRITE VERSIONED '{tdir}' SELECT * FROM src14 WHERE k = 0",
    ).collect()[0]
    assert r.op == "insert_overwrite"
    assert t.read().count() == 1
    assert t.read(version=2).count() == 10  # time travel intact
    # commit-protocol integration: constraints gate SQL inserts too
    t.set_constraints(["k >= 0"])
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        ConstraintViolation,
    )

    with pytest.raises(ConstraintViolation):
        engine_sql(
            spark,
            f"INSERT INTO VERSIONED '{tdir}' "
            "SELECT CAST(-1 AS BIGINT) AS k, 'z' AS v",
        )


def test_two_streams_one_table_exactly_once(spark, tmp_path):
    """Round-14 verdict item 7, end-to-end: TWO independent writeStream
    queries (distinct txnAppIds) feed ONE versioned table, then one of
    them restarts from its checkpoint with more input — both sequences
    stay exactly-once (no replays, no cross-app dedupe) even though
    their #sbatch watermarks interleave in the commit log."""
    import json as _json
    import os as _os

    from weather_etl_docker_airflow_project_spark.sources import (
        versioned_stream,
    )

    versioned_stream.register(spark)

    def _drop(srcdir, name, lo, hi):
        with open(_os.path.join(srcdir, name), "w") as f:
            for k in range(lo, hi):
                f.write(_json.dumps({"k": k, "v": float(k)}) + "\n")

    def _stream(srcdir, tdir, ck, app):
        return (
            spark.readStream.schema("k bigint, v double")
            .option("maxFilesPerTrigger", "1")
            .json(srcdir)
            .writeStream.format("versioned_table")
            .option("tableDir", tdir)
            .option("checkpointLocation", ck)
            .option("txnAppId", app)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    src_a, src_b = str(tmp_path / "sa"), str(tmp_path / "sb")
    _os.makedirs(src_a), _os.makedirs(src_b)
    tdir = str(tmp_path / "t")
    ck_a, ck_b = str(tmp_path / "cka"), str(tmp_path / "ckb")
    for i in range(2):
        _drop(src_a, f"a{i}.json", i * 10, (i + 1) * 10)  # keys 0..19
        _drop(src_b, f"b{i}.json", 100 + i * 10, 100 + (i + 1) * 10)
    qa = _stream(src_a, tdir, ck_a, "appA")
    assert qa.awaitTermination(180)
    qb = _stream(src_b, tdir, ck_b, "appB")
    assert qb.awaitTermination(180)
    t = VersionedTable(spark, tdir)
    assert t.read().count() == 40
    # restart ONLY stream A with one more file: B's interleaved markers
    # must not hide A's watermark, and A's batches 0-1 must not replay
    _drop(src_a, "a2.json", 20, 30)
    qa2 = _stream(src_a, tdir, ck_a, "appA")
    assert qa2.awaitTermination(180)
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(30)) + list(range(100, 120))
    # and B restarts clean too (no new input -> no new commit)
    before = t.latest_version()
    qb2 = _stream(src_b, tdir, ck_b, "appB")
    assert qb2.awaitTermination(180)
    assert t.latest_version() == before
    assert t.read().count() == 50


def test_sql_vacuum_dry_run_and_describe_history(spark, tmp_path):
    """SQL-front utilities: VACUUM ... DRY RUN reports without touching
    anything; DESCRIBE HISTORY returns one row per commit."""
    from weather_etl_docker_airflow_project_spark.operators.dml_sql import (
        engine_sql,
    )

    tdir = str(tmp_path / "t")
    t = VersionedTable(spark, tdir)
    t.commit(spark.range(5).select(F.col("id").alias("k")))
    t.commit(spark.range(5).select(F.col("id").alias("k")), mode="append")
    t.commit(spark.range(2).select(F.col("id").alias("k")), mode="overwrite")
    dry = engine_sql(
        spark, f"VACUUM '{tdir}' RETAIN 1 VERSIONS DRY RUN"
    ).collect()
    actions = {r.action for r in dry}
    assert "would_drop_version" in actions and "would_remove_dir" in actions
    assert t.versions() == [1, 2, 3]  # nothing touched
    hist = engine_sql(spark, f"DESCRIBE HISTORY '{tdir}'").collect()
    assert [r.version for r in hist] == [1, 2, 3]
    assert [r.op for r in hist] == ["append", "append", "overwrite"]
    # the real vacuum afterwards
    res = engine_sql(spark, f"VACUUM '{tdir}' RETAIN 1 VERSIONS").collect()[0]
    assert res.op == "vacuum"
    assert t.versions() == [3]
    with pytest.raises(ValueError, match="no commits"):
        engine_sql(spark, f"DESCRIBE HISTORY '{tmp_path / 'missing'}'")
