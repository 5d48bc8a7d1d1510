"""Round-15 correctness fixes (the r14 ADVICE items).

- INSERT/CTAS params bind through spark.sql's NATIVE named-parameter
  binding: backslashes and quote-edge strings survive verbatim (the old
  textual rendering corrupted them under Spark's default
  escapedStringLiterals=false), and wide-magnitude floats bind as DOUBLE
  instead of failing DECIMAL parsing.
- vacuum(retain_hours=...) keeps a CONTIGUOUS version suffix even when
  commit timestamps are non-monotone across writers, so
  latest_version()'s probe-upward resolution can never stop at a
  vacuum-created gap (stale head + version-number reuse).
- snapshot_schema()/dir_stats() return per-call copies, so a caller's
  mutation cannot poison the process-wide manifest cache.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators.dml_sql import engine_sql
from weather_etl_docker_airflow_project_spark.operators.versioned import (
    VersionedTable,
    vacuum,
)


def test_insert_params_survive_backslashes_and_quote_edges(spark, tmp_path):
    """A string param containing backslashes, a trailing backslash, and
    quotes must land in the table VERBATIM — under textual rendering
    'C:\\temp' became 'C:<tab>emp' and a trailing backslash escaped the
    closing quote (r14 ADVICE high)."""
    tdir = str(tmp_path / "t")
    hostile = "C:\\temp\\new\nend-with-backslash\\"
    quoted = "O'Brien -- ' DROP"
    engine_sql(
        spark,
        f"CREATE VERSIONED TABLE '{tdir}' AS "
        "SELECT id AS k, :a AS a, :b AS b FROM range(3)",
        {"a": hostile, "b": quoted},
    )
    rows = VersionedTable(spark, tdir).read().orderBy("k").collect()
    assert [r["a"] for r in rows] == [hostile] * 3
    assert [r["b"] for r in rows] == [quoted] * 3
    # INSERT INTO path binds the same way
    engine_sql(
        spark,
        f"INSERT INTO VERSIONED '{tdir}' "
        "SELECT id + 10 AS k, :a AS a, :b AS b FROM range(1)",
        {"a": hostile, "b": quoted},
    )
    got = VersionedTable(spark, tdir).read().filter(F.col("k") == 10).collect()
    assert got[0]["a"] == hostile and got[0]["b"] == quoted


def test_insert_float_params_bind_at_any_magnitude(spark, tmp_path):
    """1e300 has >38 significant decimal digits in plain-decimal form —
    textual rendering made Spark parse it as DECIMAL and fail; native
    binding types it DOUBLE (r14 ADVICE low)."""
    tdir = str(tmp_path / "t")
    engine_sql(
        spark,
        f"CREATE VERSIONED TABLE '{tdir}' AS "
        "SELECT id AS k, :x AS x FROM range(2)",
        {"x": 1e300},
    )
    rows = VersionedTable(spark, tdir).read().collect()
    assert all(r["x"] == 1e300 for r in rows)


def test_vacuum_timestamp_retention_keeps_contiguous_suffix(
    spark, tmp_path, monkeypatch
):
    """Non-monotone commit timestamps + retain_hours must not leave a
    version-number gap: latest_version() probes upward from the
    checkpoint and a gap would freeze the visible head below the true
    latest (r14 ADVICE medium)."""
    import weather_etl_docker_airflow_project_spark.operators.versioned as V

    t = VersionedTable(spark, str(tmp_path / "t"))
    df = spark.range(2).select(F.col("id").alias("k"))
    for _ in range(4):
        t.commit(df, mode="append")
    # forge non-monotone timestamps: v2 is NEW (inside the window), v3
    # is OLD (a writer with a slow clock) — the pre-fix keep set was
    # {2, 4} (newest-1 ∪ ts-window), dropping v3 mid-log.
    now = __import__("time").time()
    stamps = {1: now - 7200, 2: now - 60, 3: now - 7200, 4: now - 30}
    real_cts = VersionedTable.commit_timestamp

    def fake_cts(self, version):
        if self.dir == t.dir and version in stamps:
            return stamps[version]
        return real_cts(self, version)

    monkeypatch.setattr(VersionedTable, "commit_timestamp", fake_cts)
    vacuum(t, retain_versions=1, retain_hours=1.0)
    kept = t.versions()
    assert kept == sorted(kept)
    # contiguity: no gaps between the oldest kept and the head
    assert kept == list(range(kept[0], kept[-1] + 1))
    assert 2 in kept and 3 in kept and 4 in kept
    assert t.latest_version() == 4


def test_public_accessors_return_defensive_copies(spark, tmp_path):
    """Mutating the returned schema/stats must not poison the shared
    manifest cache for later readers (r14 ADVICE low)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_stats_columns(["k"])
    t.commit(spark.range(3).select(F.col("id").alias("k")))
    sch = t.snapshot_schema(1)
    sch.add("intruder", "string")
    assert [f.name for f in t.snapshot_schema(1).fields] == ["k"]
    stats = t.dir_stats(1)
    d = next(iter(stats))
    stats[d]["k"]["lo"] = "poisoned"
    assert t.dir_stats(1)[d]["k"]["lo"] != "poisoned"
