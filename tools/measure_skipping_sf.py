"""Round-11 decade measurements for the data-skipping family.

Part A — the four new queries (s33 stats-pruned scan, s34 z-order table
optimize, s35 restore, t22 commit-log stream) timed at a given sf_dir
with the bench calibration probe, matching the SCALE.md subset protocol.

Part B — the read-side skipping payoff isolated from fixture building:
on a year-batched versioned orders table, time the SAME range aggregate
(i) through `read_where` (manifest-stats pruning) and (ii) through a
full `read().filter(...)` scan, plus the same pair on a z-order
clustered table with a two-dimension predicate. The ratio is the number
the manifest-stats design buys at 100 TB (where it becomes the
difference between reading a slice and reading the table).

Usage: python tools/measure_skipping_sf.py [sf_dir]
(default /root/testdata/sf0.1; pass .scratch/sf1 / .scratch/sf3)
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from weather_etl_docker_airflow_project_spark.io import load_table, scratch_dir  # noqa: E402
from weather_etl_docker_airflow_project_spark.operators.versioned import (  # noqa: E402
    VersionedTable,
    cluster_rewrite,
)
from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

QUERIES = [
    "s33_stats_pruned_scan",
    "s34_zorder_table_optimize",
    "s35_restore_rollback",
    "t22_versioned_stream_source",
]


def _calibration(spark) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(200_000_000).select(
            F.xxhash64("id").alias("h")
        ).agg(F.max("h")).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="skipmeasure", shuffle_partitions=32)
    out: dict = {"sf_dir": sf_dir, "calibration": round(_calibration(spark), 3)}

    for name in QUERIES:
        t0 = time.time()
        catalog.REGISTRY[name].fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 2)

    # Part B: pruned vs full on the same fixtures (built once, timed after)
    o = load_table(spark, sf_dir, "orders")
    t_year = VersionedTable(
        spark, os.path.join(scratch_dir("skipm_"), "orders_years")
    )
    t_year.set_stats_columns(["o_orderdate"])
    for year in range(1995, 2002):
        lo = F.lit(f"{year}-01-01").cast("timestamp")
        hi = F.lit(f"{year + 1}-01-01").cast("timestamp")
        t_year.commit(
            o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            mode="append",
        )
    pred = (
        "o_orderdate",
        "between",
        (datetime.datetime(1997, 6, 1), datetime.datetime(1998, 3, 1)),
    )

    def _agg(df):
        return df.agg(
            F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        ).collect()

    def _time2(df) -> float:
        # min-of-2 with the pair interleaved by the caller: first runs
        # warm the page cache, so a single-shot A-then-B comparison
        # systematically penalizes A
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _agg(df)
            best = min(best, time.time() - t0)
        return round(best, 2)

    dfp, rep = t_year.read_where([pred])
    full = t_year.read().filter(
        F.col("o_orderdate").between(F.lit(pred[2][0]), F.lit(pred[2][1]))
    )
    out["yearly_full_s"] = _time2(full)
    out["yearly_pruned_s"] = _time2(dfp)
    out["yearly_pruned_dirs"] = f"{rep.scanned_dirs}/{rep.total_dirs}"
    # the metric that scales: how many FILES each plan even opens — at
    # cloud scale listing+opening is the cost local NVMe hides
    out["yearly_pruned_files"] = len(dfp.inputFiles())
    out["yearly_full_files"] = len(full.inputFiles())

    t_z = VersionedTable(
        spark, os.path.join(scratch_dir("skipm_"), "orders_z")
    )
    t_z.set_stats_columns(["o_totalprice", "o_orderdate"])
    t_z.commit(o)
    t0 = time.time()
    cluster_rewrite(t_z, ["o_totalprice", "o_orderdate"], n_chunks=16, bits=6)
    out["cluster_rewrite_s"] = round(time.time() - t0, 2)
    preds = [
        ("o_totalprice", "between", (150000.0, 250000.0)),
        (
            "o_orderdate",
            "between",
            (datetime.datetime(1997, 1, 1), datetime.datetime(1998, 1, 1)),
        ),
    ]
    dfz, repz = t_z.read_where(preds)
    fullz = t_z.read().filter(
        F.col("o_totalprice").between(150000.0, 250000.0)
        & F.col("o_orderdate").between(F.lit(preds[1][2][0]), F.lit(preds[1][2][1]))
    )
    out["zorder_full_s"] = _time2(fullz)
    out["zorder_pruned_s"] = _time2(dfz)
    out["zorder_pruned_dirs"] = f"{repz.scanned_dirs}/{repz.total_dirs}"
    out["zorder_pruned_files"] = len(dfz.inputFiles())
    out["zorder_full_files"] = len(fullz.inputFiles())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
