"""Round-15 optimization harness: time registered queries and capture
their ``explain("formatted")`` plans.

Usage::

    python tools/prof_r16.py q1 q2 ...            # time, 3 runs each
    python tools/prof_r16.py --explain before q1  # also write
                                                  # plans/r16/<q>_before.txt
    python tools/prof_r16.py --runs 2 q1

Timing methodology matches bench.py (wall of plan+execute+count on a warm
session, min-of-N) so numbers here are directly comparable to
BENCH_DETAIL.json entries.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--explain",
        choices=["before", "after"],
        default=None,
        help="write plans/r16/<q>_<label>.txt with explain('formatted')",
    )
    args = ap.parse_args()

    names = []
    for n in args.names:
        matches = [q for q in catalog.REGISTRY if q == n or q.startswith(n)]
        if not matches:
            raise SystemExit(f"no registered query matches {n!r}")
        names.extend(matches if n not in catalog.REGISTRY else [n])

    spark = build_session(app_name="r16-prof")
    # same warmup as bench.py
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    df.groupBy().count().collect()
    df.mapInPandas(lambda it: (pdf for pdf in it), "id long, h string").count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    for name in names:
        spec = catalog.REGISTRY[name]
        best, rows = None, 0
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            out = spec.fn(spark, SF_DIR)
            rows = out.count()
            dt = time.time() - t0
            walls.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        print(f"{name}: min={best:.3f}s runs={walls} rows={rows}", flush=True)
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spec.fn(spark, SF_DIR).explain("formatted")
            path = os.path.join(plans_dir, f"{name}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"  wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
