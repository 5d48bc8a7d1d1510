"""Measure the Bloom-pruned join's shuffle reduction at sf1 — the
metric-backed number behind j13's "~0.4% of lineitem shuffled" claim
(r7 verdict item 7). Prints pruned vs unpruned shuffleRecordsWritten /
shuffleBytesWritten for the j13 fact-side aggregation shape, then the
ratios recorded in SCALE.md.

Usage: python tools/measure_bloom_sf1.py [sf_dir]   (default .scratch/sf1)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from weather_etl_docker_airflow_project_spark.io import load_table  # noqa: E402
from weather_etl_docker_airflow_project_spark.metrics import shuffle_written  # noqa: E402
from weather_etl_docker_airflow_project_spark.operators import bloomjoin  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    spark = build_session(app_name="bloom-measure", shuffle_partitions=32)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    build = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey")
    keys = build.select(F.col("s_suppkey").alias("l_suppkey")).distinct()

    n_fact = l.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    t0 = time.time()
    u_recs, u_bytes = shuffle_written(l.join(keys, "l_suppkey", "left_semi"))
    t_unpruned = time.time() - t0

    t0 = time.time()
    bitmap = bloomjoin.build_bloom_bitmap(build, "s_suppkey")
    survivors = bloomjoin.bloom_prune(l, "l_suppkey", bitmap)
    p_recs, p_bytes = shuffle_written(survivors.join(keys, "l_suppkey", "left_semi"))
    t_pruned = time.time() - t0

    print(f"fact rows: {n_fact}")
    print(f"unpruned: {u_recs} recs / {u_bytes} bytes shuffled ({t_unpruned:.1f}s)")
    print(f"pruned:   {p_recs} recs / {p_bytes} bytes shuffled ({t_pruned:.1f}s)")
    print(
        f"reduction: records {p_recs / u_recs:.4%} of unpruned, "
        f"bytes {p_bytes / u_bytes:.4%}"
    )


if __name__ == "__main__":
    main()
