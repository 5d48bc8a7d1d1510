"""Round-13 decade measurement: POSITION deletion vectors vs the S32
key-set vectors — the claim under test is the r12 verdict's item 3:
"the scattered-delete SCALE.md table gains a read row that is FLAT in
|DV|".

Protocol (mirrors tools/measure_round12_sf.py part B.2): scattered
merge-on-read delete of HALF the orders keys (every even o_orderkey —
maximally scattered, every file touched; the parity rides a
pre-computed ``even`` column because the predicate grammar is
deliberately arithmetic-free), once as a key-set vector
(delete_by_keys merge_on_read) and once as a position vector
(delete_where merge_on_read), then a full-snapshot aggregate through
each representation, min-of-3 interleaved with a vector-free baseline.
The key-set wall grows with |DV| (broadcast hash build + per-row
probe); the position wall should track the DATA size only (per-task
mask application is O(file rows), per-task vector read is O(its own
positions) via row-group pruning on the file-sorted vector).

Usage: python tools/measure_round13_pdv.py [sf_dir ...]
(default: /root/testdata/sf0.1 .scratch/sf1 .scratch/sf3)
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
    delete_by_keys,
    delete_where,
)
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402


def _wall(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def measure(spark, sf_dir: str) -> dict:
    orders = spark.read.parquet(
        os.path.join(sf_dir, "orders.parquet")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    tagged = orders.withColumn(
        "even", (F.col("o_orderkey") % 2 == 0).cast("boolean")
    )
    n_rows = orders.count()
    scratch = tempfile.mkdtemp(prefix="pdv_measure_")
    out: dict = {"sf_dir": sf_dir, "rows": n_rows, "dv_size": n_rows // 2}

    def _agg(table):
        def run():
            table.read().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("s"),
            ).collect()

        return run

    try:
        tb = VersionedTable(spark, os.path.join(scratch, "plain"))
        tb.commit(tagged.repartition(8))

        tk = VersionedTable(spark, os.path.join(scratch, "keyset"))
        tk.commit(tagged.repartition(8))
        t0 = time.time()
        delete_by_keys(
            tk,
            tagged.filter("even").select("o_orderkey"),
            ["o_orderkey"],
            merge_on_read=True,
        )
        out["keyset_delete_s"] = round(time.time() - t0, 3)

        tp = VersionedTable(spark, os.path.join(scratch, "position"))
        tp.commit(tagged.repartition(8))
        t0 = time.time()
        delete_where(tp, "even = TRUE", merge_on_read=True)
        out["position_delete_s"] = round(time.time() - t0, 3)
        out["positions_recorded"] = spark.read.parquet(
            tp.position_dvs(tp.versions()[-1])[0]["path"]
        ).count()

        # interleaved read walls: baseline / key-set / position
        out["plain_read_s"] = round(_wall(_agg(tb)), 3)
        out["keyset_read_s"] = round(_wall(_agg(tk)), 3)
        out["position_read_s"] = round(_wall(_agg(tp)), 3)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(ROOT, ".scratch/sf1"),
        os.path.join(ROOT, ".scratch/sf3"),
    ]
    spark = build_session(app_name="measure-r13-pdv", shuffle_partitions=32)
    for sf in sf_dirs:
        if not os.path.isdir(sf):
            print(json.dumps({"sf_dir": sf, "skipped": "missing"}))
            continue
        print(json.dumps(measure(spark, sf)))
    spark.stop()


if __name__ == "__main__":
    main()
