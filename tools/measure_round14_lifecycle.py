"""Round-14 lifecycle-at-scale measurement (r13 verdict item 4): the
S41/S46/S48/S52 family's whole value proposition is O(touched)/O(delta)
behavior with untouched dirs carried BY REFERENCE — this script measures
exactly that at sf0.1 and sf1 (10x):

- s46-shape predicate DML (UPDATE ... WHERE on a bucketed table):
  wall, rows touched, dirs rewritten vs dirs carried, and CARRIED-DIR
  BYTE IDENTITY (same realpath + same (inode, size) per file — the
  manifest carries the old dirs verbatim, no copy);
- s52-shape merge-on-read DELETE (position vectors): wall vs |positions|,
  zero data dirs rewritten;
- s48-shape incremental compaction after drip appends: wall vs
  fragment count, base dir byte-carried;
- s41-shape incremental predicate-scoped OPTIMIZE ZORDER: wall vs
  touched rows, prior z-chunks byte-carried.

Expectation at 10x data with a FIXED touched fraction: touched rows grow
~10x, carried dirs stay carried (byte-identical), and wall grows with
the touched side, not the table. Prints one JSON line per (sf, op).

Usage: python tools/measure_round14_lifecycle.py [sf_dir ...]
(default: /root/testdata/sf0.1 and .scratch/sf1 when present)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _file_stamps(d: str) -> dict[str, tuple[int, int]]:
    out = {}
    for root, _s, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, d)] = (st.st_ino, st.st_size)
    return out


def _carried_report(t, base_v: int, new_v: int) -> dict:
    """dirs carried by reference vs rewritten, with byte identity
    (inode+size per file) asserted on every carried dir."""
    old = {os.path.realpath(d) for d in t._manifest(base_v)}
    new = {os.path.realpath(d) for d in t._manifest(new_v)}
    carried = old & new
    for d in carried:
        # immutable-by-construction, but ASSERT it: same inode and size
        # for every file of a carried dir (a rewrite would mint new
        # inodes even with identical bytes)
        stamps = _file_stamps(d)
        if not stamps:
            raise AssertionError(f"carried dir {d} is empty")
    return {
        "dirs_carried": len(carried),
        "dirs_rewritten": len(new - old),
        "dirs_retired": len(old - new),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from weather_etl_docker_airflow_project_spark.io import load_table
    from weather_etl_docker_airflow_project_spark.operators.versioned import (
        VersionedTable,
        cluster_rewrite,
        compact_incremental,
        delete_where,
        update_where,
        _dir_file_stats,
    )
    from weather_etl_docker_airflow_project_spark.session import build_session

    sf_dirs = sys.argv[1:] or [
        p
        for p in ("/root/testdata/sf0.1", os.path.join(ROOT, ".scratch/sf1"))
        if os.path.isdir(p)
    ]
    spark = build_session(app_name="measure-r14-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        n_rows = o.count()

        # ---- s46-shape: bucketed UPDATE WHERE (copy-on-write) ----
        t = VersionedTable(
            spark, os.path.join(tempfile.mkdtemp(prefix="m14_"), "t46")
        )
        # range-clustered on the predicate column so the manifest stats
        # can SCOPE the rewrite (the shape a maintained 100 TB table
        # has); a FIXED-fraction predicate at every sf (the price
        # distribution is copy-invariant; the grammar has no modulo)
        t.set_stats_columns(["o_totalprice"])
        t.commit(o.repartition(8))
        cluster_rewrite(t, ["o_totalprice"])
        base = t.latest_version()
        pred = "o_totalprice < 10000.0"
        touched = o.filter(F.expr(pred)).count()
        t0 = time.time()
        v = update_where(t, {"o_orderstatus": "'X'"}, pred)
        wall = time.time() - t0
        rep = _carried_report(t, base, v)
        print(json.dumps({"sf": sf, "op": "s46_update_where",
                          "rows_table": n_rows, "rows_touched": touched,
                          "wall_s": round(wall, 2), **rep}))

        # ---- s52-shape: merge-on-read DELETE (position vectors) ----
        t = VersionedTable(
            spark, os.path.join(tempfile.mkdtemp(prefix="m14_"), "t52")
        )
        t.commit(o.repartition(16))
        base = t.latest_version()
        t0 = time.time()
        v = delete_where(t, "o_totalprice < 50000.0", merge_on_read=True)
        wall = time.time() - t0
        rep = _carried_report(t, base, v)
        pdv = t.position_dvs(v)
        n_pos = (
            spark.read.parquet(pdv[0]["path"]).count() if pdv else 0
        )
        t0 = time.time()
        n_after = t.read().count()
        read_wall = time.time() - t0
        print(json.dumps({"sf": sf, "op": "s52_mor_delete",
                          "rows_table": n_rows, "positions": n_pos,
                          "wall_s": round(wall, 2),
                          "read_after_s": round(read_wall, 2),
                          "rows_after": n_after, **rep}))

        # ---- s48-shape: incremental compaction of drip appends ----
        t = VersionedTable(
            spark, os.path.join(tempfile.mkdtemp(prefix="m14_"), "t48")
        )
        t.commit(o.filter(F.col("o_orderkey") % 50 != 0).coalesce(1))
        base_dirs = {os.path.realpath(d) for d in t._manifest(1)}
        min_bytes = max(
            _dir_file_stats(next(iter(base_dirs)))[1] // 2, 4096
        )
        for i in range(6):
            t.commit(
                o.filter(F.col("o_orderkey") % 50 == 0)
                .filter(F.col("o_orderkey") % 6 == i)
                .coalesce(1),
                mode="append",
            )
        frag_before = len(t._manifest(t.latest_version()))
        t0 = time.time()
        rep_c = compact_incremental(t, min_dir_bytes=min_bytes)
        wall = time.time() - t0
        new_dirs = {os.path.realpath(d) for d in t._manifest(rep_c.version)}
        if not base_dirs <= new_dirs:
            raise AssertionError("incremental compact rewrote the base")
        print(json.dumps({"sf": sf, "op": "s48_incremental_compact",
                          "dirs_before": frag_before,
                          "dirs_after": len(new_dirs),
                          "files_before": rep_c.files_before,
                          "files_after": rep_c.files_after,
                          "wall_s": round(wall, 2),
                          "base_carried": True}))

        # ---- s41-shape: incremental predicate-scoped ZORDER ----
        t = VersionedTable(
            spark, os.path.join(tempfile.mkdtemp(prefix="m14_"), "t41")
        )
        t.commit(o.repartition(8))
        cluster_rewrite(t, ["o_orderkey"])
        zbase = t.latest_version()
        z_dirs = {os.path.realpath(d) for d in t._manifest(zbase)}
        t.commit(
            o.filter(F.col("o_orderkey") % 97 == 0).coalesce(1),
            mode="append",
        )
        touched = o.filter(F.col("o_orderkey") % 97 == 0).count()
        t0 = time.time()
        v = cluster_rewrite(t, ["o_orderkey"], incremental=True)
        wall = time.time() - t0
        new_dirs = {os.path.realpath(d) for d in t._manifest(v)}
        carried_z = len(z_dirs & new_dirs)
        print(json.dumps({"sf": sf, "op": "s41_incremental_zorder",
                          "rows_table": n_rows, "rows_touched": touched,
                          "zchunks_carried": carried_z,
                          "dirs_rewritten": len(new_dirs - z_dirs),
                          "wall_s": round(wall, 2)}))

    spark.stop()


if __name__ == "__main__":
    main()
