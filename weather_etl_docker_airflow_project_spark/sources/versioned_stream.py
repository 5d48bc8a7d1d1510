"""Streaming SOURCE over a versioned table's commit log — Delta's
``spark.readStream.format("delta")`` in miniature, the read half of the
lakehouse streaming loop whose write half is t20's commit-per-batch sink
(`streaming/windows.stream_versioned_commits`).

Offsets ARE version numbers: micro-batch (start, end] replays exactly the
batch dirs that APPEND commits start+1..end added (manifest set
difference — pure metadata). That makes the source replayable/exactly-
once-capable by construction: data files are immutable and the manifest
is the commit, so ``partitions(start, end)`` re-resolves to byte-
identical files after any crash. Non-append commits (overwrite/merge/
delete rewrites, or a deletion-vector commit changing visible rows
without touching dirs) have no well-defined append delta — the reader
raises unless ``ignoreChanges=true``, which applies Delta's exact
contract: the commit's NEW dirs are still delivered (a rewrite's
carried rows arrive again — consumers must tolerate duplicates, the
documented trade), only the removals are invisible.

Scale shape: the DRIVER does only manifest arithmetic (O(dirs) per
trigger); each added parquet FILE becomes one InputPartition, and
executors stream it through pyarrow as Arrow RecordBatches — no
per-row Python, no driver data movement. Files written before an
additive schema evolution surface NULL for the evolved-in columns
(the same fill the batch reader applies).

Implemented with the Python DataSource streaming API (pyspark 4,
`DataSourceStreamReader` — the partition-planning variant, not
`SimpleDataSourceStreamReader`, precisely so reads stay executor-side).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..operators.versioned import VersionedTable


class _FileSlice(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, _sub, files in os.walk(d):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return out


def _dv_lines(table: VersionedTable, version: int) -> set[str]:
    return {
        dv["path"] + "::" + "::".join(dv["covers"])
        for dv in table.deletion_vectors(version)
    }


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        table_dir = options.get("tabledir") or options.get("path")
        if not table_dir:
            raise ValueError(
                "versioned_table_stream needs .option('tableDir', ...)"
            )
        # VersionedTable's manifest accessors are pure path arithmetic —
        # no SparkSession needed on this side
        self._table = VersionedTable(None, table_dir)
        self._start = int(options.get("startingversion", 0))
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._per_batch = int(options.get("maxversionsperbatch", 0))
        self._pace_dir = options.get("pacestatedir")
        self._last_end = None
        from pyspark.sql.pandas.types import to_arrow_schema

        self._arrow_schema = to_arrow_schema(schema)
        # column mapping: files carry PHYSICAL names; the stream's
        # declared schema is logical. Physical ids are stable across
        # renames, so the map captured at plan time reads every commit
        # in the range correctly even if logical names evolved.
        committed = self._table.versions()
        self._phys = (
            self._table.column_mapping(committed[-1]) if committed else None
        ) or {}

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def _load_pace_floor(self) -> int | None:
        if self._pace_dir is None:
            return None
        try:
            with open(os.path.join(self._pace_dir, "floor")) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _save_pace_floor(self, v: int) -> None:
        if self._pace_dir is None:
            return
        os.makedirs(self._pace_dir, exist_ok=True)
        tmp = os.path.join(self._pace_dir, ".floor.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self._pace_dir, "floor"))

    def latestOffset(self) -> dict:
        committed = self._table.versions()
        latest = committed[-1] if committed else self._start
        latest = max(latest, self._start)
        if self._per_batch > 0:
            # pacing: advance at most k commits per trigger so a drain
            # exercises real multi-batch replay. The floor must SURVIVE
            # a checkpoint restart: a fresh reader pacing from
            # startingVersion would report an offset BELOW the engine's
            # recovered offset, the offset log would step backward, and
            # already-delivered versions would re-deliver under new
            # batch ids (a real duplicate the restart pytest caught —
            # 280 rows from a 240-row table). ``paceStateDir`` (point it
            # inside the query's checkpoint dir) persists the floor
            # across restarts; without it, a paced RESTART is refused in
            # partitions() rather than allowed to duplicate.
            floor = self._last_end
            persisted = self._load_pace_floor()
            if persisted is not None:
                floor = max(floor or 0, persisted)
            if floor is None:
                floor = self._start
            latest = min(latest, floor + self._per_batch)
            self._save_pace_floor(latest)
        self._last_end = max(latest, self._last_end or 0)
        return {"version": latest}

    def _added_dirs(self, v_from: int, v_to: int) -> list[str]:
        committed = set(self._table.versions())
        if v_from != 0 and v_from not in committed:
            # the stream's last committed offset was VACUUMED out of the
            # commit log: prev_dirs is unknowable, and defaulting it to
            # empty would re-deliver the entire next manifest as "added"
            # (silent duplicates). Refuse loudly — the fix is retention
            # above the stream's lag, the same contract as Delta's
            # "files were deleted" streaming failure.
            raise ValueError(
                f"stream offset version {v_from} is no longer in the "
                f"commit log at {self._table.dir} (vacuumed under an "
                "active stream?); the append delta from it is undefined "
                "— raise the table's vacuum retention above the "
                "stream's lag and restart from a fresh startingVersion"
            )
        prev_dirs = (
            set(self._table._manifest(v_from)) if v_from in committed else set()
        )
        prev_dvs = (
            _dv_lines(self._table, v_from) if v_from in committed else set()
        )
        added: list[str] = []
        prev = v_from
        for v in sorted(c for c in committed if v_from < c <= v_to):
            cur_dirs = set(self._table._manifest(v))
            cur_dvs = _dv_lines(self._table, v)
            removed = prev_dirs - cur_dirs
            if (removed or cur_dvs != prev_dvs) and not self._ignore_changes:
                raise ValueError(
                    f"commit {v} at {self._table.dir} is not a pure "
                    "append (dirs removed or deletion vectors "
                    "changed); the streamed delta is undefined — set "
                    ".option('ignoreChanges','true') to skip such "
                    "commits (Delta's contract)"
                )
            # Every commit's NEW dirs are delivered — including a
            # non-append commit under ignoreChanges (Delta's exact
            # contract: a rewrite's carried-forward rows arrive AGAIN,
            # consumers must tolerate duplicates — the documented
            # trade); only the removal itself is invisible to an
            # append stream. A DV commit adds no dirs, so it
            # contributes nothing either way.
            added.extend(sorted(cur_dirs - prev_dirs))
            prev_dirs, prev_dvs, prev = cur_dirs, cur_dvs, v
        return added

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        if end["version"] < start["version"]:
            # only reachable when a PACED query was restarted without
            # paceStateDir: the fresh floor reported an offset below the
            # engine's recovered one. Refuse loudly — committing the
            # backward offset would re-deliver versions under new batch
            # ids (silent duplicates)
            raise ValueError(
                f"paced offset {end['version']} is behind the recovered "
                f"offset {start['version']} — a restarted paced query "
                "needs .option('paceStateDir', <dir inside the "
                "checkpoint>) so the pacing floor survives restarts "
                "(or drop maxVersionsPerBatch)"
            )
        # planned ranges reveal the engine's real offset position —
        # never pace below it
        self._last_end = max(
            self._last_end or 0, start["version"], end["version"]
        )
        dirs = self._added_dirs(start["version"], end["version"])
        parts = [_FileSlice(f) for d in dirs for f in _parquet_files(d)]
        # an empty micro-batch is legal (e.g. every windowed commit was
        # skipped under ignoreChanges) but the API needs >= 1 partition;
        # a sentinel with no path yields zero rows
        return parts or [_FileSlice("")]

    def read(self, partition: _FileSlice):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = {}
        for field in self._arrow_schema:
            fname = self._phys.get(field.name, field.name)
            if fname in tbl.column_names:
                cols[field.name] = tbl.column(fname).cast(field.type)
            else:
                # pre-evolution file: the evolved-in column surfaces NULL,
                # matching the batch reader's recorded-schema fill
                cols[field.name] = pa.nulls(tbl.num_rows, type=field.type)
        out = pa.table(cols, schema=self._arrow_schema)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass


class VersionedTableStreamSource(DataSource):
    """``spark.readStream.format("versioned_table_stream")``. Options:
    ``tableDir`` (required), ``startingVersion`` (default 0 = from the
    beginning; pass the current version to stream only future commits),
    ``ignoreChanges`` (Delta semantics: non-append commits stop raising;
    their new dirs are still delivered — possible duplicates — and
    removals/DV deletes stay invisible),
    ``maxVersionsPerBatch`` (pace a drain into real multi-batch replay; a PACED query that must survive checkpoint restarts also needs ``paceStateDir`` — a dir inside its checkpoint — so the pacing floor persists; without it a paced restart is refused rather than allowed to re-deliver).
    The stream's schema is the table's RECORDED manifest schema (the
    ``#schema=`` header riding every commit) — resolved once at plan
    time, O(1) metadata."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table_stream"

    def schema(self):
        table_dir = self.options.get("tabledir") or self.options.get("path")
        if not table_dir:
            raise ValueError(
                "versioned_table_stream needs .option('tableDir', ...)"
            )
        t = VersionedTable(None, table_dir)
        committed = t.versions()
        if not committed:
            raise ValueError(
                f"versioned table at {table_dir} has no commits to stream"
            )
        schema = t.snapshot_schema(committed[-1])
        if schema is None:
            raise ValueError(
                f"versioned table at {table_dir} has no recorded manifest "
                "schema (pre-tracking manifest) — commit once to record it"
            )
        return schema

    def streamReader(self, schema) -> VersionedTableStreamReader:
        return VersionedTableStreamReader(schema, self.options)


class _CDFSlice(InputPartition):
    def __init__(self, path: str, version: int, kind: str):
        self.path = path
        self.version = version
        self.kind = kind  # 'cdf' (materialized feed file) | 'insert'


class VersionedCDFStreamReader(VersionedTableStreamReader):
    """Streaming ROW-LEVEL change feed — Delta's
    ``readChangeFeed`` streaming (t23), the streaming twin of the batch
    ``read_changes_cdc``. Offsets are version numbers exactly like the
    t22 commit-log reader (the offset/pacing machinery is inherited);
    what differs is partition planning:

    - a commit with a MATERIALIZED feed (``#cdf=`` header — MERGE and
      DELETE commits on a CDF-enabled table) streams its cdf files:
      full rows + ``_change_type`` as written, O(changed rows);
    - a pure APPEND commit streams its added data files as ``insert``
      rows (no cdf file is ever written for appends — Delta's cost
      model: the delta IS the added files);
    - a row-preserving rewrite (``compact``/``zorder`` op) is SKIPPED —
      Delta's dataChange=false;
    - any other non-append commit without a feed (overwrite, restore,
      pre-CDF merges) raises: its row delta was never recorded and
      cannot be synthesized from the manifest (enable the feed before
      writing, or fall back to batch ``read_changes_cdc``).

    Executors stream files through pyarrow exactly like the parent —
    zero per-row Python, zero driver data. The declared schema is the
    table schema plus ``_change_type``/``_commit_version`` metadata
    columns (Delta's CDF read schema)."""

    META_COLS = ("_change_type", "_commit_version")

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        if end["version"] < start["version"]:
            raise ValueError(
                f"paced offset {end['version']} is behind the recovered "
                f"offset {start['version']} — a restarted paced query "
                "needs .option('paceStateDir', <dir inside the "
                "checkpoint>) so the pacing floor survives restarts "
                "(or drop maxVersionsPerBatch)"
            )
        self._last_end = max(
            self._last_end or 0, start["version"], end["version"]
        )
        v_from, v_to = start["version"], end["version"]
        committed = self._table.versions()
        if v_from != 0 and v_from not in committed:
            raise ValueError(
                f"stream offset version {v_from} is no longer in the "
                f"commit log at {self._table.dir} (vacuumed under an "
                "active stream?) — raise retention above the stream's "
                "lag and restart from a fresh startingVersion"
            )
        if v_from == 0 and committed and committed[0] != 1:
            # unlike the append stream (whose first surviving manifest
            # IS a complete snapshot), a cdf-from-the-beginning needs
            # every commit's feed: history vacuumed before
            # committed[0] means the replica would silently bootstrap
            # incomplete — Delta's "cannot read version" CDF error
            raise ValueError(
                f"change feed from version 0 at {self._table.dir} is "
                f"incomplete: history before version {committed[0]} was "
                "vacuumed; start from a version whose manifest survives "
                "and bootstrap the replica from a snapshot read"
            )
        prev_dirs = (
            set(self._table._manifest(v_from))
            if v_from in committed
            else set()
        )
        prev_dvs = (
            _dv_lines(self._table, v_from) if v_from in committed else set()
        )
        parts: list[InputPartition] = []
        for v in sorted(c for c in committed if v_from < c <= v_to):
            cur_dirs = set(self._table._manifest(v))
            cur_dvs = _dv_lines(self._table, v)
            cdf = self._table.cdf_path(v)
            if cdf is not None:
                parts.extend(
                    _CDFSlice(f, v, "cdf") for f in _parquet_files(cdf)
                )
            elif not (prev_dirs - cur_dirs) and cur_dvs == prev_dvs:
                parts.extend(
                    _CDFSlice(f, v, "insert")
                    for d in sorted(cur_dirs - prev_dirs)
                    for f in _parquet_files(d)
                )
            elif self._table.commit_op(v) in ("compact", "zorder"):
                pass  # row-preserving rewrite: dataChange=false, skip
            else:
                raise ValueError(
                    f"commit {v} at {self._table.dir} changed rows but "
                    "recorded no change data feed (op="
                    f"{self._table.commit_op(v)!r}); enable_change_data_"
                    "feed() before row-changing writes, or use the batch "
                    "read_changes_cdc"
                )
            prev_dirs, prev_dvs = cur_dirs, cur_dvs
        return parts or [_CDFSlice("", 0, "insert")]

    def read(self, partition: _CDFSlice):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        cols = {}
        for field in self._arrow_schema:
            if field.name == "_commit_version":
                cols[field.name] = pa.array(
                    [partition.version] * tbl.num_rows, type=field.type
                )
                continue
            if field.name == "_change_type" and partition.kind == "insert":
                cols[field.name] = pa.array(
                    ["insert"] * tbl.num_rows, type=field.type
                )
                continue
            # cdf files are written under LOGICAL names; data files
            # under the table's physical mapping
            fname = (
                field.name
                if partition.kind == "cdf"
                else self._phys.get(field.name, field.name)
            )
            if fname in tbl.column_names:
                cols[field.name] = tbl.column(fname).cast(field.type)
            else:
                # pre-evolution file: evolved-in column surfaces NULL
                cols[field.name] = pa.nulls(tbl.num_rows, type=field.type)
        out = pa.table(cols, schema=self._arrow_schema)
        yield from out.to_batches()


class VersionedCDFStreamSource(DataSource):
    """``spark.readStream.format("versioned_cdf_stream")`` — the
    streaming row-level change feed (Delta's ``readChangeFeed``).
    Options: ``tableDir`` (required), ``startingVersion``,
    ``maxVersionsPerBatch`` + ``paceStateDir`` (same pacing contract as
    `versioned_table_stream`). Schema: the table's recorded manifest
    schema plus ``_change_type`` (string) and ``_commit_version``
    (long)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdf_stream"

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        table_dir = self.options.get("tabledir") or self.options.get("path")
        if not table_dir:
            raise ValueError(
                "versioned_cdf_stream needs .option('tableDir', ...)"
            )
        t = VersionedTable(None, table_dir)
        committed = t.versions()
        if not committed:
            raise ValueError(
                f"versioned table at {table_dir} has no commits to stream"
            )
        schema = t.snapshot_schema(committed[-1])
        if schema is None:
            raise ValueError(
                f"versioned table at {table_dir} has no recorded manifest "
                "schema (pre-tracking manifest) — commit once to record it"
            )
        return StructType(
            list(schema.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema) -> VersionedCDFStreamReader:
        return VersionedCDFStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(VersionedTableStreamSource)
    spark.dataSource.register(VersionedCDFStreamSource)
