"""CLI: the reference pipeline as spark-submit-able commands.

The reference runs a 5-task Airflow DAG every 2 minutes
(``airflow/dags/weather_etl.py:29,228``); here the same work is:

    python -m weather_etl_docker_airflow_project_spark ingest-once --sink /data/weather
    python -m weather_etl_docker_airflow_project_spark stream --landing /data/landing \\
        --sink /data/weather --checkpoint /data/ck --interval "2 minutes"
    python -m weather_etl_docker_airflow_project_spark show --sink /data/weather

Config rides the reference's own .env contract (README.md:66-72):
WEATHER_API_KEY, WEATHER_CITY, WEATHER_LANG, WEATHER_UNITS. ``--canned``
substitutes the golden fixture records for offline runs/tests. Airflow
(or cron) schedules `ingest-once` per tick, or supervises one long-lived
`stream` process — data never rides XCom either way.
"""

from __future__ import annotations

import argparse
import sys

from .fixtures import CANNED_WEATHER
from .session import build_session
from .sources.rest import fetch_from_env
from .streaming.pipeline import land_records, run_cycle, start_stream


def _fetcher(canned: bool):
    return (lambda: CANNED_WEATHER) if canned else fetch_from_env


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="weather_etl_docker_airflow_project_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("ingest-once", help="one extract->transform->upsert cycle")
    p1.add_argument("--sink", required=True)
    p1.add_argument("--canned", action="store_true", help="use golden fixture records")

    p2 = sub.add_parser("land", help="poll once and land raw JSON for the stream")
    p2.add_argument("--landing", required=True)
    p2.add_argument("--canned", action="store_true")

    p3 = sub.add_parser("stream", help="micro-batch file stream: landing -> sink")
    p3.add_argument("--landing", required=True)
    p3.add_argument("--sink", required=True)
    p3.add_argument("--checkpoint", required=True)
    p3.add_argument("--interval", default="2 minutes")  # reference cadence (:29)
    p3.add_argument("--available-now", action="store_true", help="drain pending files, then exit")

    p4 = sub.add_parser("show", help="print the sink contents")
    p4.add_argument("--sink", required=True)
    p4.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    if args.cmd == "land":
        path = land_records(_fetcher(args.canned), args.landing)
        print(f"landed {path}")
        return 0

    spark = build_session(app_name=f"weather-etl-{args.cmd}")
    if args.cmd == "ingest-once":
        n = run_cycle(spark, _fetcher(args.canned), args.sink)
        print(f"appended {n} new rows to {args.sink}")
    elif args.cmd == "stream":
        q = start_stream(
            spark,
            args.landing,
            args.sink,
            args.checkpoint,
            trigger_interval=args.interval,
            available_now=args.available_now,
        )
        q.awaitTermination()
    elif args.cmd == "show":
        for row in spark.read.parquet(args.sink).limit(args.limit).collect():
            print(tuple(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
