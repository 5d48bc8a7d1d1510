"""Round-10 surface: the r9 ADVICE closures — read-modify-write conflict
detection on versioned-table overwrite commits (compact vs concurrent
append), the float64-exactness guard on the IVF assignment kernel, the
ivf_add grow-path seed cap parameter, and per-invocation cache release
in the shingle-pair builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_etl_docker_airflow_project_spark.operators import dedup, similarity
from weather_etl_docker_airflow_project_spark.operators.versioned import (
    ConcurrentCommitError,
    VersionedTable,
    compact,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _feed(t, **kw):
    return sorted(
        (r["k"], r["change_type"], r["commit_version"])
        for r in t.read_changes_cdc(**kw).collect()
    )


# ---------------------------------------------------------------------------
# commit(expected_base_version=...) — read-modify-write guard
# ---------------------------------------------------------------------------


def test_commit_stale_expected_base_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    t.commit(_mk(spark, [(2, "b")]), mode="append")
    # a writer that read v1 and tries to publish against it must fail:
    # v2 landed after its read
    with pytest.raises(ConcurrentCommitError, match="expected base version 1"):
        t.commit(_mk(spark, [(9, "x")]), mode="overwrite", expected_base_version=1)
    # against the true latest it publishes exactly base+1
    v = t.commit(_mk(spark, [(9, "x")]), mode="overwrite", expected_base_version=2)
    assert v == 3


def test_commit_expected_base_on_empty_table(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(ConcurrentCommitError, match="expected base version 5"):
        t.commit(_mk(spark, [(1, "a")]), expected_base_version=5)
    assert t.commit(_mk(spark, [(1, "a")]), expected_base_version=0) == 1


def test_compact_detects_concurrent_append(spark, tmp_path, monkeypatch):
    """The r9 ADVICE scenario: an append landing between compact's read
    and its publish must fail the compaction, NOT be silently erased by
    the rewrite's snapshot (Delta's OPTIMIZE conflict rule)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a"), (2, "b")]).repartition(4))
    other = VersionedTable(spark, str(tmp_path / "t"))
    real_read = t.read

    def read_with_interloper(version=None):
        other.commit(_mk(spark, [(99, "z")]), mode="append")
        return real_read(version=version)

    monkeypatch.setattr(t, "read", read_with_interloper)
    with pytest.raises(ConcurrentCommitError):
        compact(t)
    # the interloping append survives in the latest snapshot
    latest = {(r["k"], r["v"]) for r in other.read().collect()}
    assert (99, "z") in latest and (1, "a") in latest
    # and a RETRY (no interloper this time) succeeds against the new base
    monkeypatch.setattr(t, "read", real_read)
    rep = compact(t)
    assert {(r["k"], r["v"]) for r in t.read(version=rep.version).collect()} == latest


# ---------------------------------------------------------------------------
# _cell_assign_udf float64-exactness guard
# ---------------------------------------------------------------------------


def test_cell_assign_rejects_overscale_seed_components():
    # dim 4: bound = floor(sqrt(2^53/4)) ~ 4.74e7 — 5e7 must raise
    with pytest.raises(ValueError, match="exactness bound"):
        similarity._cell_assign_udf(
            [{"sid": 0, "sv": [5 * 10**7] * 4}, {"sid": 1, "sv": [1] * 4}]
        )


def test_cell_assign_bound_is_dimension_derived():
    # r10 advice: the old hardcoded 1.1e7 was only valid to dim 64. A
    # WIDE vector with 1.1e7 components must now be rejected (dim 256:
    # bound ~ 5.9e6 < 1.1e7)...
    with pytest.raises(ValueError, match="exactness bound"):
        similarity._cell_assign_udf([{"sid": 0, "sv": [11_000_000] * 256}])
    # ...while a NARROW one may legally exceed the old constant
    similarity._cell_assign_udf([{"sid": 0, "sv": [2 * 10**7] * 4}])
    assert similarity.exact_dot_bound(64) > 1.1e7 > similarity.exact_dot_bound(256)


def test_cell_assign_rejects_overscale_batch_components(spark):
    _cell = similarity._cell_assign_udf([{"sid": 0, "sv": [1, 1, 1, 1]}])
    df = spark.createDataFrame(
        [(1, [5 * 10**7, 0, 0, 0])], ["id", "qv"]
    ).select("id", F.col("qv").cast("array<long>").alias("qv"))
    with pytest.raises(Exception, match="exactness bound"):
        df.select(_cell(F.col("qv")).alias("cell")).collect()


# ---------------------------------------------------------------------------
# ivf_add(max_seeds=...) — grow path honors the build-time cap
# ---------------------------------------------------------------------------


def test_ivf_add_respects_custom_max_seeds(spark):
    import os

    from weather_etl_docker_airflow_project_spark.io import scratch_dir

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter((F.col("vec_id") % 2 == 0) | (F.col("vec_id") % 125 == 0))
    delta = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 125 != 0))
    path = os.path.join(scratch_dir("ivf_add_cap_t"), "index")
    similarity.build_ivf_index(base, path)
    n_seeds = spark.read.parquet(path + "/seeds").count()
    assert n_seeds > 2
    # a cap below the index's true seed count fails loudly, naming the fix
    with pytest.raises(ValueError, match="pass the max_seeds"):
        similarity.ivf_add(spark, path, delta, max_seeds=2)
    # the cap the index was built under grows it fine
    similarity.ivf_add(spark, path, delta, max_seeds=max(n_seeds, 4))


# ---------------------------------------------------------------------------
# shingle-pair builders release their corpus-sized caches
# ---------------------------------------------------------------------------


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


@pytest.mark.parametrize("fn", ["ngram_jaccard_pairs", "containment_pairs"])
def test_pair_builders_release_shingle_cache(spark, fn):
    """The shingle table persist must not outlive the invocation: after
    the builder returns, the only new pinned blocks are the (small)
    localCheckpoint of the pair result — the corpus-sized shingle cache
    is released (the similarity.py cache-hygiene rule)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    before = _persistent_ids(spark)
    out = getattr(dedup, fn)(docs, "doc_id", "text")
    assert out.count() >= 0
    new = _persistent_ids(spark) - before
    # exactly the checkpointed result may remain pinned; the shingle
    # cache (a second, corpus-sized entry) must be gone
    assert len(new) <= 1


# ---------------------------------------------------------------------------
# merge_upsert (MERGE INTO)
# ---------------------------------------------------------------------------


def _merge_mod():
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        merge_upsert,
    )

    return merge_upsert


def test_merge_updates_inserts_and_carries_over(spark, tmp_path):
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = merge_upsert(t, _mk(spark, [(2, "B!"), (9, "new")]), keys=["k"])
    assert v == 2
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {
        (1, "a"),  # carried over
        (2, "B!"),  # updated
        (3, "c"),  # carried over
        (9, "new"),  # inserted
    }
    # time travel: the pre-merge snapshot is intact
    assert {(r["k"], r["v"]) for r in t.read(version=1).collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    # keyed CDC across the merge sees exactly the update + insert
    feed = _feed(t, v_from=1, keys=["k"], compare_cols=["v"])
    assert feed == [(2, "update", 2), (9, "insert", 2)]


def test_merge_duplicate_source_keys_raise(spark, tmp_path):
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="duplicate merge-key"):
        merge_upsert(t, _mk(spark, [(2, "x"), (2, "y")]), keys=["k"])


def test_merge_schema_mismatch_raises(spark, tmp_path):
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    bad = spark.createDataFrame([(1, "a", 0)], ["k", "v", "extra"])
    # unflagged additive columns still raise (r11: the message now points
    # at allow_schema_evolution, Delta's autoMerge)
    with pytest.raises(ValueError, match="allow_schema_evolution"):
        merge_upsert(t, bad, keys=["k"])


def test_merge_detects_concurrent_append(spark, tmp_path, monkeypatch):
    """Same read-modify-write race as compact: an append landing between
    the merge's read and its publish fails the merge, its rows survive."""
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    other = VersionedTable(spark, str(tmp_path / "t"))
    real_read = t.read

    def read_with_interloper(version=None):
        other.commit(_mk(spark, [(99, "z")]), mode="append")
        return real_read(version=version)

    monkeypatch.setattr(t, "read", read_with_interloper)
    with pytest.raises(ConcurrentCommitError):
        merge_upsert(t, _mk(spark, [(1, "A!")]), keys=["k"])
    latest = {(r["k"], r["v"]) for r in other.read().collect()}
    assert latest == {(1, "a"), (99, "z")}
    # retry against the new base applies the update and keeps the append
    monkeypatch.setattr(t, "read", real_read)
    merge_upsert(t, _mk(spark, [(1, "A!")]), keys=["k"])
    assert {(r["k"], r["v"]) for r in t.read().collect()} == {(1, "A!"), (99, "z")}


def test_semantic_dedup_keep_contract(spark):
    """Every corpus vector appears exactly once; kept iff it is its
    cluster's minimum (or a singleton); dropped rows point at a kept
    canonical in the same cluster."""
    from weather_etl_docker_airflow_project_spark.plans.llm_q import (
        l2_semantic_dedup_keep,
    )

    rows = l2_semantic_dedup_keep(spark, "/root/testdata/sf0.001").collect()
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert len(rows) == n_emb
    assert len({r["vec_id"] for r in rows}) == n_emb
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1 and kept[0]["vec_id"] == cid == min(
            m["vec_id"] for m in members
        )


# ---------------------------------------------------------------------------
# clone (shallow) + replicate_changes (CDC sink)
# ---------------------------------------------------------------------------


def test_clone_is_zero_copy_and_diverges(spark, tmp_path):
    import glob

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        clone,
    )

    t = VersionedTable(spark, str(tmp_path / "src"))
    t.commit(_mk(spark, [(1, "a"), (2, "b")]))
    c = clone(t, str(tmp_path / "cl"))
    # zero-copy: the clone holds NO parquet of its own yet
    assert glob.glob(str(tmp_path / "cl") + "/data/**/*.parquet", recursive=True) == []
    assert {(r["k"], r["v"]) for r in c.read().collect()} == {(1, "a"), (2, "b")}
    # divergence: clone writes stage under the CLONE's data dir and
    # never disturb the source
    c.commit(_mk(spark, [(9, "z")]), mode="append")
    assert glob.glob(str(tmp_path / "cl") + "/data/**/*.parquet", recursive=True)
    assert {r["k"] for r in c.read().collect()} == {1, 2, 9}
    assert {r["k"] for r in t.read().collect()} == {1, 2}
    # and source writes never disturb the clone
    t.commit(_mk(spark, [(7, "s")]), mode="append")
    assert {r["k"] for r in c.read().collect()} == {1, 2, 9}


def test_clone_pinned_version_and_occupied_target(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        clone,
    )

    t = VersionedTable(spark, str(tmp_path / "src"))
    t.commit(_mk(spark, [(1, "a")]))
    t.commit(_mk(spark, [(2, "b")]), mode="append")
    c = clone(t, str(tmp_path / "cl1"), version=1)
    assert {r["k"] for r in c.read().collect()} == {1}
    with pytest.raises(ValueError, match="already has commits"):
        clone(t, str(tmp_path / "cl1"))
    with pytest.raises(ValueError, match="not committed"):
        clone(t, str(tmp_path / "cl2"), version=9)


def test_replicate_changes_replays_all_change_types(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        clone,
        replicate_changes,
    )

    src = VersionedTable(spark, str(tmp_path / "src"))
    src.commit(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    replica = clone(src, str(tmp_path / "rep"), version=1)
    # commit 2: append (inserts); commit 3: overwrite with an update
    # (2 -> B), a delete (3), and an insert (5)
    src.commit(_mk(spark, [(4, "d")]), mode="append")
    src.commit(
        _mk(spark, [(1, "a"), (2, "B"), (4, "d"), (5, "e")]), mode="overwrite"
    )
    replicate_changes(src, replica, v_from=1, keys=["k"])
    want = {(1, "a"), (2, "B"), (4, "d"), (5, "e")}
    assert {(r["k"], r["v"]) for r in replica.read().collect()} == want
    # idempotent tail: replaying a no-change range publishes nothing
    before = replica.versions()
    replicate_changes(src, replica, v_from=src.versions()[-1], keys=["k"])
    assert replica.versions() == before


# ---------------------------------------------------------------------------
# triangle wedge-stream regime (big-graph path)
# ---------------------------------------------------------------------------


def test_triangle_wedge_stream_matches_attach_path(spark):
    """The bloom-filtered wedge-stream regime (entered past
    max_attach_edges) must be row-identical to the attach formulation —
    the bloom is pure plan shape (fp removed by the exact semi-join)."""
    from weather_etl_docker_airflow_project_spark.operators.graph import (
        triangle_counts,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    grp = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    capped = grp.filter((F.size("ps") <= 8) & (F.size("ps") >= 2))
    pair = F.expr(
        "flatten(transform(ps, (a, i) -> transform(slice(ps, i + 2, "
        "size(ps) - i - 1), b -> named_struct('a', a, 'b', b))))"
    )
    edges = (
        capped.select(F.explode(pair).alias("e"))
        .select(F.col("e.a").cast("long").alias("a"), F.col("e.b").cast("long").alias("b"))
        .distinct()
    )
    attach = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(edges).collect()
    }
    stream = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(edges, max_attach_edges=0).collect()
    }
    assert attach == stream and len(attach) > 0


# ---------------------------------------------------------------------------
# CHECK constraints (S27) + NULL-key merge semantics
# ---------------------------------------------------------------------------


def test_merge_null_key_rows_insert_without_tripping_validation(spark, tmp_path):
    """A NULL merge key never matches any target row (standard SQL MERGE:
    NOT MATCHED -> insert); it must not trip the duplicate-source-key
    validation (count_distinct ignores NULLs — the r10 self-review fix)."""
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(_mk(spark, [(1, "a")]))
    src = spark.createDataFrame([(2, "b"), (None, "nk")], "k int, v string")
    merge_upsert(t, src, keys=["k"])
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b"), (None, "nk")}


def test_constraints_reject_bad_commit_and_publish_nothing(spark, tmp_path):
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        ConstraintViolation,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_constraints(["k > 0", "v IS NOT NULL"])
    t.commit(_mk(spark, [(1, "a"), (2, "b")]))
    with pytest.raises(ConstraintViolation, match="2 row"):
        t.commit(_mk(spark, [(-1, "x"), (0, "y"), (3, "ok")]), mode="append")
    # nothing published: still exactly one version, snapshot intact
    assert t.versions() == [1]
    assert {r["k"] for r in t.read().collect()} == {1, 2}
    # vacuum reclaims the torn batch dir
    import glob

    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        vacuum,
    )

    assert len(glob.glob(str(tmp_path / "t" / "data" / "batch_*"))) == 2
    # grace=0: the torn batch is seconds old, and the default staging
    # grace would (correctly) defer it as possibly-in-flight
    vacuum(t, retain_versions=1, staged_grace_seconds=0)
    assert len(glob.glob(str(tmp_path / "t" / "data" / "batch_*"))) == 1


def test_constraints_unknown_satisfies_and_drop(spark, tmp_path):
    """SQL CHECK: NULL/UNKNOWN satisfies — a NULL v passes `v <> 'x'`
    unless an explicit IS NOT NULL constraint exists; set_constraints([])
    drops enforcement."""
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        ConstraintViolation,
    )

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.set_constraints(["v <> 'x'"])
    # k is BIGINT to match _mk's inferred type: the s31 type-stability
    # rule (round 11) correctly rejects an int->bigint append, and this
    # test is about CHECK semantics, not schema drift
    t.commit(spark.createDataFrame([(1, None)], "k bigint, v string"))  # UNKNOWN ok
    assert t.read().count() == 1
    with pytest.raises(ConstraintViolation):
        t.commit(_mk(spark, [(2, "x")]), mode="append")
    t.set_constraints([])
    t.commit(_mk(spark, [(2, "x")]), mode="append")  # dropped -> accepted
    assert t.read().count() == 2


def test_merge_conditional_update(spark, tmp_path):
    """WHEN MATCHED AND cond THEN UPDATE: condition-true rows replaced,
    condition-false/UNKNOWN matched rows carried over untouched,
    unmatched source rows still insert."""
    merge_upsert = _merge_mod()
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, None, "c")],
            "k int, ts int, v string",
        )
    )
    src = spark.createDataFrame(
        [(1, 11, "A"), (2, 5, "stale"), (3, 7, "C"), (9, 1, "new")],
        "k int, ts int, v string",
    )
    merge_upsert(t, src, keys=["k"], when_matched_condition="s.ts > t.ts")
    got = {(r["k"], r["ts"], r["v"]) for r in t.read().collect()}
    assert got == {
        (1, 11, "A"),    # 11 > 10: replaced
        (2, 20, "b"),    # 5 > 20 false: carried over
        (3, None, "c"),  # 7 > NULL unknown: carried over (SQL MERGE)
        (9, 1, "new"),   # unmatched: inserted
    }
    # idempotent replay: merging the same source again changes nothing
    v_before = t.versions()[-1]
    merge_upsert(t, src, keys=["k"], when_matched_condition="s.ts > t.ts")
    assert {(r["k"], r["ts"], r["v"]) for r in t.read().collect()} == got
    assert t.versions()[-1] == v_before + 1  # a commit happened, rows equal
