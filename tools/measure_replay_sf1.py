"""Round-11 replay measurements at sf1 (1.5M-row orders):

A) bucket-granular vs full-rewrite CDC replay (verdict item 1's done
   criterion: replay cost ∝ changed buckets, not table size): the same
   10-commit sparse feed (4 keys per commit) is replayed into (i) a
   64-bucket replica and (ii) an unbucketed replica. The bucketed replay
   rewrites ≤4 buckets/commit (~6% of the table); the unbucketed replay
   rewrites the full snapshot per commit.

B) feed-probe batching (verdict item 6): replay latency of a 20-commit
   feed under the r11 replicate_changes (feed localCheckpoint + ONE
   leg-count aggregation) vs a faithful reimplementation of the r10 loop
   (lazy feed re-executed per commit + two limit(1).count() probe jobs
   per commit).

Usage: python tools/measure_replay_sf1.py [sf_dir]   (default .scratch/sf1)
Prints one JSON line; record the numbers in SCALE.md / NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_docker_airflow_project_spark.operators.versioned import (  # noqa: E402
    VersionedTable,
    clone,
    delete_by_keys,
    merge_upsert,
)
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402


def _mk_source(spark, sf_dir, root, bucketed: bool, n_commits: int, keys_per: int):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderstatus"
    )
    src = VersionedTable(spark, os.path.join(root, "src"))
    if bucketed:
        src.set_layout(["o_orderkey"], 64)
    src.commit(o)
    keys = [r["o_orderkey"] for r in o.select("o_orderkey").limit(n_commits * keys_per).collect()]
    for c in range(n_commits):
        batch = keys[c * keys_per : (c + 1) * keys_per]
        upd = spark.createDataFrame(
            [(k, "R") for k in batch], "o_orderkey long, o_orderstatus string"
        )
        merge_upsert(src, upd, keys=["o_orderkey"])
    return src


def _legacy_replicate(source, target, v_from, keys):
    """The r10 replicate_changes loop, verbatim semantics: lazy feed
    re-filtered per commit, two limit(1).count() probes per commit, and
    deletes as a hand-rolled anti-join overwrite."""
    feed = source.read_changes_cdc(v_from=v_from, keys=keys)
    commits = sorted(
        r["commit_version"]
        for r in feed.select("commit_version").distinct().collect()
    )
    final_version = target.versions()[-1]
    for v in commits:
        batch = feed.filter(F.col("commit_version") == v)
        upsert_keys = batch.filter(
            F.col("change_type").isin("insert", "update")
        ).select(*keys)
        del_keys = batch.filter(F.col("change_type") == "delete").select(*keys)
        if upsert_keys.limit(1).count():
            payload = source.read(version=v).join(upsert_keys, keys, "left_semi")
            final_version = merge_upsert(target, payload, keys=keys)
        if del_keys.limit(1).count():
            final_version = delete_by_keys(target, del_keys, keys=keys)
    return final_version


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".scratch", "sf1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = build_session(app_name="replay-measure")
    out: dict = {"sf_dir": sf_dir}
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        replicate_changes,
    )

    # ---- A: bucketed vs unbucketed replay of the same sparse history
    for label, bucketed in (("bucketed", True), ("unbucketed", False)):
        root = tempfile.mkdtemp(prefix=f"replay_{label}_")
        try:
            src = _mk_source(spark, sf_dir, root, bucketed, n_commits=10, keys_per=4)
            rep = clone(src, os.path.join(root, "rep"), version=1)
            t0 = time.time()
            replicate_changes(src, rep, v_from=1, keys=["o_orderkey"])
            out[f"replay10_{label}_sec"] = round(time.time() - t0, 2)
            n = rep.read().filter(F.col("o_orderstatus") == "R").count()
            assert n == 40, n
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # ---- B: r11 replicate_changes vs the r10 probe loop, 20 commits
    for label, fn in (("r11", replicate_changes), ("r10_legacy", _legacy_replicate)):
        root = tempfile.mkdtemp(prefix=f"replay_{label}_")
        try:
            src = _mk_source(spark, sf_dir, root, True, n_commits=20, keys_per=4)
            rep = clone(src, os.path.join(root, "rep"), version=1)
            t0 = time.time()
            fn(src, rep, v_from=1, keys=["o_orderkey"])
            out[f"replay20_{label}_sec"] = round(time.time() - t0, 2)
            n = rep.read().filter(F.col("o_orderstatus") == "R").count()
            assert n == 80, n
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
