"""PySpark-native custom data sources (the Python DataSource API, Spark 4):

- ``WeatherFeedDataSource`` — a partition-parallel BATCH source emitting a
  deterministic synthetic weather-station feed (the engine's stand-in for
  the reference's polled REST observations, reference
  airflow/dags/weather_etl.py:95-117, re-expressed as a first-class Spark
  source instead of a driver-side ``requests.get``). One InputPartition
  per station, so a 10k-station feed fans out across the cluster instead
  of serializing through the driver. Implements ``pushFilters`` for
  station-key predicates: pushed bounds prune entire partitions at
  planning time — source-side partition pruning, the same contract a
  parquet scan gives Catalyst.

- ``ScratchJsonSink`` — a custom Python WRITER exercising the
  DataSourceWriter commit protocol: each task writes its partition to a
  private ``part-<uuid>`` file and returns a WriterCommitMessage naming
  it; ``commit()`` publishes exactly the named files into a manifest,
  so a failed/speculative task's orphan file is never observed (the
  classic output-committer contract, here in pure Python).

Determinism: the feed is a closed-form integer function of
(station, seq) — no wall clock, no RNG state — so a DuckDB oracle can
regenerate it exactly from ``generate_series``; all columns are
BIGINT/STRING (no floats anywhere).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

_WIND_DIRS = ("N", "NE", "E", "SE", "S", "SW", "W", "NW")


def feed_row(station: int, seq: int) -> tuple[int, int, int, int, str]:
    """Closed-form observation for (station, seq) — mirrored verbatim by
    the SQL oracle (plans/io_q.py s15): milli-degC temperature, integer
    humidity %, and a compass wind direction."""
    temp_c_milli = (station * 1000003 + seq * 7919) % 60000 - 20000
    humidity_pct = (station * 31 + seq * 17) % 101
    wind_dir = _WIND_DIRS[(station + seq) % 8]
    return (station, seq, temp_c_milli, humidity_pct, wind_dir)


@dataclass
class _StationPartition(InputPartition):
    station: int


class WeatherFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_stations = int(options.get("stations", 4))
        self.obs_per_station = int(options.get("obs_per_station", 250))
        # station-key bounds tightened by pushFilters; start unbounded
        self.lo = 0
        self.hi = self.n_stations - 1

    def pushFilters(self, filters):
        for f in filters:
            col = getattr(f, "attribute", None)
            if (
                col == ("station_id",)
                and isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
                )
                # only claim the filter when the comparison value has the
                # shape the bounds arithmetic expects — a null literal or
                # non-int value (v + 1 would TypeError at planning time)
                # yields back to Spark-side filtering instead (bool is an
                # int subclass but not a station id)
                and isinstance(f.value, int)
                and not isinstance(f.value, bool)
            ):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v - 1)
                else:
                    self.hi = min(self.hi, v)
                # fully handled here — do NOT yield it back to Spark
            else:
                yield f

    def partitions(self):
        # pushed station bounds prune whole partitions at planning time.
        # A contradictory predicate (station_id = 99, >5 AND <3) prunes
        # EVERYTHING — but PySpark substitutes [None] for an empty
        # partitions() list and would call read(None), so emit one
        # explicit empty sentinel instead of [].
        if self.lo > self.hi:
            return [_StationPartition(-1)]
        return [_StationPartition(s) for s in range(self.lo, self.hi + 1)]

    def read(self, partition: _StationPartition):
        if partition is None or partition.station < 0:  # pruned-empty sentinel
            return
        s = partition.station
        for seq in range(self.obs_per_station):
            yield feed_row(s, seq)


class WeatherFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_feed"

    def schema(self) -> str:
        return (
            "station_id BIGINT, obs_seq BIGINT, temp_c_milli BIGINT, "
            "humidity_pct BIGINT, wind_dir STRING"
        )

    def reader(self, schema) -> DataSourceReader:
        return WeatherFeedReader(self.options)


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    rows: int


class ScratchJsonWriter(DataSourceWriter):
    """Commit-protocol demonstration sink. write() runs in TASK context
    and targets ``options["path"]`` directly — correct here because
    local-mode tasks share the driver's filesystem. On a multi-node
    cluster this path MUST be a shared filesystem (NFS/S3/HDFS mount
    visible under one namespace from every executor); with executor-local
    disks the driver-side manifest would silently reference files it
    cannot see. The commit protocol itself (private staging names,
    manifest-published visibility, abort cleanup) is the portable part."""

    def __init__(self, options):
        self.dir = options["path"]

    def write(self, rows: Iterator) -> _FileCommit:
        # private per-task file: name is unguessable, so concurrent /
        # speculative attempts never collide; only files named in a
        # commit message become visible.
        path = os.path.join(self.dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        import json

        with open(path, "w", encoding="utf-8") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(path=path, rows=n)

    def commit(self, messages):
        # publish: the manifest lists exactly the committed task outputs —
        # readers go through it, so orphans from aborted attempts are
        # invisible (committer contract).
        manifest = os.path.join(self.dir, "_MANIFEST")
        with open(manifest, "w", encoding="utf-8") as fh:
            for m in messages:
                fh.write(f"{m.path}\t{m.rows}\n")

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ScratchJsonSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "scratch_jsonl"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return ScratchJsonWriter(self.options)


def manifest_files(sink_dir: str) -> list[str]:
    """Files published by ScratchJsonSink's commit — the only sanctioned
    way to read its output."""
    with open(os.path.join(sink_dir, "_MANIFEST"), encoding="utf-8") as fh:
        return [line.split("\t")[0] for line in fh.read().splitlines() if line]


def register(spark) -> None:
    """Idempotently register both sources on the session, and enable the
    Python-source filter-pushdown conf (runtime-settable; off by default,
    and the round driver's vanilla session won't have set it)."""
    # deliberately left on for the session: it is the feature-enable flag
    # for ALL Python-source pushdown, not a per-query behavior switch
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for cls in (WeatherFeedDataSource, ScratchJsonSink, WeatherFeedStreamSource):
        try:
            spark.dataSource.register(cls)
        except Exception as e:  # re-register on a warm session is fine;
            if "EXISTS" not in str(e).upper() and "already" not in str(e).lower():
                raise  # anything else is a real registration failure


class FeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant of the weather feed: offsets are a plain row
    cursor into the same closed-form (station, seq) space, so replays
    (``readBetweenOffsets`` after a crash) regenerate byte-identical
    rows — the property that makes the source exactly-once-capable."""

    def __init__(self, options):
        self.n_stations = int(options.get("stations", 2))
        self.obs_per_station = int(options.get("obs_per_station", 100))
        self.total = self.n_stations * self.obs_per_station
        # rows returned per read() poll; 0 = everything available. An
        # availableNow run snapshots ONE prefetched chunk as its end
        # offset, so the contract query leaves this at 0 (full drain in
        # one batch); a live processingTime run would set a real rate
        # limit here.
        self.chunk = int(options.get("chunk", 0)) or self.total

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, lo: int, hi: int):
        # materialized list, not a generator: the engine deep-copies the
        # prefetched chunk into its offset cache, and generators don't
        # pickle
        return [feed_row(i % self.n_stations, i // self.n_stations) for i in range(lo, hi)]

    def read(self, start: dict):
        lo = start["i"]
        if lo >= self.total:  # caught up: no rows, offset unchanged
            return ([], start)
        hi = min(lo + self.chunk, self.total)
        return (self._rows(lo, hi), {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["i"], end["i"])


class WeatherFeedStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_feed_stream"

    def schema(self) -> str:
        return (
            "station_id BIGINT, obs_seq BIGINT, temp_c_milli BIGINT, "
            "humidity_pct BIGINT, wind_dir STRING"
        )

    def simpleStreamReader(self, schema) -> FeedStreamReader:
        return FeedStreamReader(self.options)
