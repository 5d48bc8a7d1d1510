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
    with pytest.raises(ValueError, match="exactness bound"):
        similarity._cell_assign_udf(
            [{"sid": 0, "sv": [2 * 10**7] * 4}, {"sid": 1, "sv": [1] * 4}]
        )


def test_cell_assign_rejects_overscale_batch_components(spark):
    _cell = similarity._cell_assign_udf([{"sid": 0, "sv": [1, 1, 1, 1]}])
    df = spark.createDataFrame(
        [(1, [2 * 10**7, 0, 0, 0])], ["id", "qv"]
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
