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
    DataSourceReader,
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
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    # fully sorted (os.walk's subdir order is OS-arbitrary): offsets
    # that SPLIT a commit's file list rely on a stable enumeration
    return sorted(out)


def _dv_lines(table: VersionedTable, version: int) -> set[str]:
    # both vector kinds count: a position-vector commit changes visible
    # rows without touching dirs, exactly like a key-set DV commit
    return {
        dv["path"] + "::" + "::".join(dv["covers"])
        for dv in table.deletion_vectors(version)
    } | {
        "pdv::" + dv["path"] + "::" + "::".join(dv["covers"])
        for dv in table.position_dvs(version)
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
        # round-13 (r12 verdict item 6): pace by FILES, not only commit
        # count — offsets can split one huge commit across micro-batches
        self._per_batch_files = int(options.get("maxfilesperbatch", 0))
        self._pace_dir = options.get("pacestatedir")
        self._last_end: tuple[int, int] | None = None
        # arrow schema is derived LAZILY (r16): __init__ also runs in the
        # long-lived offsets/partitions runner process, which never reads
        # data — deferring to_arrow_schema keeps pyarrow (~0.2s import)
        # out of that process entirely; executor read() tasks compute it
        # once per unpickled reader instance
        self._schema = schema
        self._arrow_schema_cache = None
        # column mapping: files carry PHYSICAL names; the stream's
        # declared schema is logical. Physical ids are stable across
        # renames, so the map captured at plan time reads every commit
        # in the range correctly even if logical names evolved.
        head = self._table.latest_version()
        self._phys = (
            self._table.column_mapping(head) if head is not None else None
        ) or {}

    @property
    def _arrow_schema(self):
        # defensive getattr: a property getter's internal AttributeError
        # is masked by the descriptor protocol into "object has no
        # attribute '_arrow_schema'" — surface real failures instead,
        # and tolerate an instance snapshot pickled by a pre-lazy
        # version of this class (its __dict__ carries the eager field,
        # shadowed by this data descriptor)
        cached = getattr(self, "_arrow_schema_cache", None)
        if cached is None:
            schema = getattr(self, "_schema", None)
            if schema is None:
                return self.__dict__["_arrow_schema"]
            from pyspark.sql.pandas.types import to_arrow_schema

            cached = to_arrow_schema(schema)
            self._arrow_schema_cache = cached
        return cached

    @staticmethod
    def _off_tuple(offset: dict) -> tuple[int, int]:
        """(version, files): commits <= version are fully delivered,
        PLUS the first ``files`` delta files of the SUCCESSOR commit
        (``files > 0`` = a split commit in flight — stable because file
        enumeration is fully sorted and data dirs are immutable). The
        encoding is chosen so plain tuple order IS delivery order:
        (v, 0) < (v, k) < (v+1, 0)."""
        return (offset["version"], offset.get("files", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start, "files": 0}

    def _succ(self, v: int) -> int | None:
        """The smallest committed version above ``v`` (the split-commit
        identity for a mid-commit offset). Versions are allocated
        contiguously, so v+1 existing answers in one stat — the full
        listing only runs when v+1 was vacuumed from under the
        offset."""
        if os.path.exists(
            os.path.join(self._table._versions, str(v + 1))
        ):
            return v + 1
        later = [c for c in self._table.versions() if c > v]
        return later[0] if later else None

    def _load_pace_floor(self) -> tuple[int, int] | None:
        if self._pace_dir is None:
            return None
        try:
            with open(os.path.join(self._pace_dir, "floor")) as f:
                raw = f.read().strip()
        except FileNotFoundError:
            return None
        try:
            if raw.startswith("{"):
                import json

                d = json.loads(raw)
                return (int(d["version"]), int(d.get("files", 0)))
            return (int(raw), 0)  # pre-r13 floor file: version only
        except (ValueError, KeyError):
            return None

    def _save_pace_floor(self, off: tuple[int, int]) -> None:
        if self._pace_dir is None:
            return
        import json

        os.makedirs(self._pace_dir, exist_ok=True)
        tmp = os.path.join(self._pace_dir, ".floor.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": off[0], "files": off[1]}))
        os.replace(tmp, os.path.join(self._pace_dir, "floor"))

    def latestOffset(self) -> dict:
        # per-trigger poll: checkpoint-bounded latest resolution keeps
        # this O(commits since the log checkpoint) at any table age —
        # the call that would otherwise list 10^5 manifests per trigger
        # on a year-old 2-minute-cadence table
        head = self._table.latest_version()
        latest = head if head is not None else self._start
        latest = max(latest, self._start)
        paced = self._per_batch > 0 or self._per_batch_files > 0
        if not paced:
            end = (latest, 0)
            self._last_end = max(self._last_end or (0, 0), end)
            return {"version": end[0], "files": end[1]}
        # pacing: advance at most k commits and/or m files per trigger
        # so a drain exercises real multi-batch replay. The floor must
        # SURVIVE a checkpoint restart: a fresh reader pacing from
        # startingVersion would report an offset BELOW the engine's
        # recovered offset, the offset log would step backward, and
        # already-delivered versions would re-deliver under new batch
        # ids (a real duplicate the restart pytest caught — 280 rows
        # from a 240-row table). ``paceStateDir`` (point it inside the
        # query's checkpoint dir) persists the floor across restarts;
        # without it, a paced RESTART is refused in partitions() rather
        # than allowed to duplicate.
        #
        # IDEMPOTENCE (round-13 lesson): the floor advances only when
        # partitions() actually PLANS a batch — the engine may invoke
        # latestOffset more than once per trigger (progress reporting),
        # and a floor ratcheted here would silently merge several pacing
        # steps into one oversized batch.
        floor = self._last_end
        persisted = self._load_pace_floor()
        if persisted is not None:
            floor = max(floor or (0, 0), persisted)
        if floor is None:
            floor = (self._start, 0)
        v_hi = latest
        if self._per_batch > 0:
            # a mid-commit floor's in-flight successor counts as the
            # first budgeted commit, so floor[0] + per_batch bounds both
            # cases uniformly under this offset encoding
            v_hi = min(latest, floor[0] + self._per_batch)
        if self._per_batch_files <= 0:
            end = (v_hi, 0) if (v_hi, 0) > floor else floor
        else:
            deltas = self._delta_slices(floor[0], max(v_hi, floor[0]))
            budget = self._per_batch_files
            end = floor
            prev_done = floor[0]
            first_v = deltas[0][0] if deltas else None
            for v, slices in deltas:
                skip = floor[1] if (floor[1] > 0 and v == first_v) else 0
                avail = len(slices) - skip
                if avail <= budget:
                    budget -= avail
                    end = (v, 0)
                    prev_done = v
                    if budget == 0:
                        break
                else:
                    end = (prev_done, skip + budget)
                    break
            if end < floor:
                end = floor
        return {"version": end[0], "files": end[1]}

    def _delta_dirs(self, v_from: int, v_to: int) -> list[tuple[int, list[str]]]:
        """Per-commit added dirs in ``(v_from, v_to]`` — the append-
        stream contract: raises on non-append commits (removed dirs or
        changed deletion vectors) unless ``ignoreChanges``. Planning
        cost is O(range), never O(table age): versions are allocated
        contiguously and retention retires only a prefix, so membership
        over [v_from, v_to] is per-version existence probes — no full
        commit-log listing per micro-batch."""
        committed = {
            v
            for v in range(max(v_from, 1), v_to + 1)
            if os.path.exists(
                os.path.join(self._table._versions, str(v))
            )
        }
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
        out: list[tuple[int, list[str]]] = []
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
            out.append((v, sorted(cur_dirs - prev_dirs)))
            prev_dirs, prev_dvs = cur_dirs, cur_dvs
        return out

    def _added_dirs(self, v_from: int, v_to: int) -> list[str]:
        return [d for _v, ds in self._delta_dirs(v_from, v_to) for d in ds]

    def _delta_slices(
        self, v_from: int, v_to: int
    ) -> list[tuple[int, list[InputPartition]]]:
        """Per-commit InputPartitions (one per parquet FILE, fully
        sorted) — the unit both pacing dials and split-commit offsets
        count in."""
        return [
            (v, [_FileSlice(f) for d in ds for f in _parquet_files(d)])
            for v, ds in self._delta_dirs(v_from, v_to)
        ]

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = self._off_tuple(start), self._off_tuple(end)
        if e < s:
            # only reachable when a PACED query was restarted without
            # paceStateDir: the fresh floor reported an offset below the
            # engine's recovered one. Refuse loudly — committing the
            # backward offset would re-deliver versions under new batch
            # ids (silent duplicates)
            raise ValueError(
                f"paced offset {e} is behind the recovered "
                f"offset {s} — a restarted paced query "
                "needs .option('paceStateDir', <dir inside the "
                "checkpoint>) so the pacing floor survives restarts "
                "(or drop maxVersionsPerBatch/maxFilesPerBatch)"
            )
        # planned ranges reveal the engine's real offset position — the
        # pacing floor ratchets HERE (a real batch is being planned),
        # never in latestOffset
        self._last_end = max(self._last_end or (0, 0), s, e)
        self._save_pace_floor(self._last_end)
        # a mid-commit endpoint names files of its SUCCESSOR commit
        s_split = self._succ(s[0]) if s[1] > 0 else None
        e_hi = (self._succ(e[0]) or e[0]) if e[1] > 0 else e[0]
        parts: list[InputPartition] = []
        for v, slices in self._delta_slices(s[0], e_hi):
            lo = s[1] if v == s_split else 0
            hi = e[1] if (e[1] > 0 and v == e_hi) else len(slices)
            parts.extend(slices[lo:hi])
        # an empty micro-batch is legal (e.g. every windowed commit was
        # skipped under ignoreChanges) but the API needs >= 1 partition;
        # a sentinel with no path yields zero rows
        return parts or [self._empty_slice()]

    def _empty_slice(self) -> InputPartition:
        return _FileSlice("")

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
    ``maxVersionsPerBatch`` (pace a drain into real multi-batch replay),
    ``maxFilesPerBatch`` (round 13: pace by FILES — offsets carry a
    ``files`` cursor so one huge commit SPLITS across micro-batches
    instead of landing whole, Delta's ``maxFilesPerTrigger``; both dials
    compose). A PACED query that must survive checkpoint restarts also
    needs ``paceStateDir`` — a dir inside its checkpoint — so the pacing
    floor persists; without it a paced restart is refused rather than
    allowed to re-deliver.
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
        head = t.latest_version()  # checkpoint-bounded, O(tail)
        if head is None:
            raise ValueError(
                f"versioned table at {table_dir} has no commits to stream"
            )
        schema = t.snapshot_schema(head)
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

    def _delta_slices(
        self, v_from: int, v_to: int
    ) -> list[tuple[int, list[InputPartition]]]:
        if v_from == 0:
            # bootstrap replay: needs the EARLIEST surviving version
            # (a full-history read is O(all commits) of work anyway,
            # so the full listing is proportional here)
            committed = self._table.versions()
            if committed and committed[0] != 1:
                # unlike the append stream (whose first surviving
                # manifest IS a complete snapshot), a cdf-from-the-
                # beginning needs every commit's feed: history vacuumed
                # before committed[0] means the replica would silently
                # bootstrap incomplete — Delta's "cannot read version"
                # CDF error
                raise ValueError(
                    f"change feed from version 0 at {self._table.dir} "
                    "is incomplete: history before version "
                    f"{committed[0]} was vacuumed; start from a version "
                    "whose manifest survives and bootstrap the replica "
                    "from a snapshot read"
                )
            committed = set(committed)
        else:
            # steady-state trigger: O(range) existence probes, never a
            # full commit-log listing (versions are contiguous and
            # retention retires only a prefix)
            committed = {
                v
                for v in range(v_from, v_to + 1)
                if os.path.exists(
                    os.path.join(self._table._versions, str(v))
                )
            }
            if v_from not in committed:
                raise ValueError(
                    f"stream offset version {v_from} is no longer in "
                    f"the commit log at {self._table.dir} (vacuumed "
                    "under an active stream?) — raise retention above "
                    "the stream's lag and restart from a fresh "
                    "startingVersion"
                )
        prev_dirs = (
            set(self._table._manifest(v_from))
            if v_from in committed
            else set()
        )
        prev_dvs = (
            _dv_lines(self._table, v_from) if v_from in committed else set()
        )
        out: list[tuple[int, list[InputPartition]]] = []
        for v in sorted(c for c in committed if v_from < c <= v_to):
            cur_dirs = set(self._table._manifest(v))
            cur_dvs = _dv_lines(self._table, v)
            cdf = self._table.cdf_path(v)
            slices: list[InputPartition] = []
            if cdf is not None:
                slices = [
                    _CDFSlice(f, v, "cdf") for f in _parquet_files(cdf)
                ]
            elif not (prev_dirs - cur_dirs) and cur_dvs == prev_dvs:
                slices = [
                    _CDFSlice(f, v, "insert")
                    for d in sorted(cur_dirs - prev_dirs)
                    for f in _parquet_files(d)
                ]
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
            out.append((v, slices))
            prev_dirs, prev_dvs = cur_dirs, cur_dvs
        return out

    def _empty_slice(self) -> InputPartition:
        return _CDFSlice("", 0, "insert")

    def read(self, partition: _CDFSlice):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        if partition.kind == "cdf":
            # cdf files carry the COMMIT-TIME logical names; a column
            # renamed since then must resolve through its stable
            # physical id, not NULL-fill (one O(1) manifest header read
            # per task)
            cm_v = self._table.column_mapping(partition.version) or {}
            inv_v = {p: l for l, p in cm_v.items()}
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
            # cdf files are written under commit-time LOGICAL names;
            # data files under the table's physical mapping
            if partition.kind == "cdf":
                fname = inv_v.get(
                    self._phys.get(field.name, field.name), field.name
                )
            else:
                fname = self._phys.get(field.name, field.name)
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
    ``maxVersionsPerBatch`` / ``maxFilesPerBatch`` + ``paceStateDir``
    (same pacing contract as `versioned_table_stream` — file pacing
    splits a large commit's cdf/insert file list across micro-batches).
    Schema: the table's recorded manifest schema plus ``_change_type``
    (string) and ``_commit_version`` (long)."""

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
        head = t.latest_version()  # checkpoint-bounded, O(tail)
        if head is None:
            raise ValueError(
                f"versioned table at {table_dir} has no commits to stream"
            )
        schema = t.snapshot_schema(head)
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


class _BatchSlice(InputPartition):
    def __init__(self, path: str, dv_paths: list[str], pdv_paths: list[str]):
        self.path = path
        self.dv_paths = dv_paths  # DV key files covering this file's dir
        self.pdv_paths = pdv_paths  # position-vector files covering it


class VersionedTableBatchReader(DataSourceReader):
    """Batch reader half of :class:`VersionedTableBatchSource` — see its
    docstring for the contract. Planning is driver-side manifest
    metadata (dir list + optional stats pruning); executors stream each
    parquet file through pyarrow, translating physical column names,
    NULL-filling pre-evolution files, and applying covering deletion
    vectors as pyarrow anti-joins (the DV broadcast-size contract: each
    task reads the O(deleted keys) key file, never another data file)."""

    def __init__(self, schema, options):
        import os as _os

        table_dir = options.get("tabledir") or options.get("path")
        self._table = VersionedTable(None, table_dir)
        v = options.get("versionasof")
        ts = options.get("timestampasof")
        if v is not None and ts is not None:
            raise ValueError("pass versionAsOf OR timestampAsOf, not both")
        if ts is not None:
            self._version = self._table.version_at_timestamp(float(ts))
        elif v is not None:
            self._version = int(v)
            if not _os.path.exists(
                _os.path.join(self._table._versions, str(self._version))
            ):
                raise ValueError(
                    f"version {self._version} not committed at {table_dir} "
                    f"(have {self._table.versions()})"
                )
        else:
            # checkpoint-bounded latest resolution (O(tail), the
            # default plan path)
            self._version = self._table.latest_version()
            if self._version is None:
                raise ValueError(
                    f"versioned table at {table_dir} has no commits"
                )
        # lazy arrow schema: partitions() planning runs in a worker that
        # never touches data (see the stream reader's note)
        self._schema = schema
        self._arrow_schema_cache = None
        self._phys = self._table.column_mapping(self._version) or {}
        self._preds: list[tuple] = []

    @property
    def _arrow_schema(self):
        # see VersionedTableStreamReader._arrow_schema for the
        # defensive-getattr rationale
        cached = getattr(self, "_arrow_schema_cache", None)
        if cached is None:
            schema = getattr(self, "_schema", None)
            if schema is None:
                return self.__dict__["_arrow_schema"]
            from pyspark.sql.pandas.types import to_arrow_schema

            cached = to_arrow_schema(schema)
            self._arrow_schema_cache = cached
        return cached

    def pushFilters(self, filters):
        """Record prunable predicates for MANIFEST-STATS dir pruning at
        planning time (the S33 payoff surfaced through the DataSource
        API), then hand every filter BACK to Spark — pruning is a sound
        under-approximation, the exact predicate still applies above."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
            Not,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            In: "in",
        }

        def _triple(f):
            # NULL-test filters carry no value; Not(EqualTo) is the one
            # negation whose pruning form (!=) the stats grammar bounds
            if isinstance(f, IsNull) and len(f.attribute) == 1:
                return (f.attribute[0], "isnull", None)
            if isinstance(f, IsNotNull) and len(f.attribute) == 1:
                return (f.attribute[0], "notnull", None)
            if isinstance(f, Not) and isinstance(f.child, EqualTo):
                c = f.child
                if len(c.attribute) == 1:
                    return (c.attribute[0], "!=", c.value)
            for klass, op in ops.items():
                if isinstance(f, klass) and len(f.attribute) == 1:
                    val = f.value if op != "in" else list(f.value)
                    return (f.attribute[0], op, val)
            return None

        for f in filters:
            t = _triple(f)
            if t is not None:
                self._preds.append(t)
            yield f  # Spark re-applies everything; we only prune dirs

    def partitions(self):
        dirs = self._table._manifest(self._version)
        if self._preds:
            stats = self._table.dir_stats(self._version)
            stats_real = {
                os.path.realpath(d): s for d, s in stats.items()
            }
            from ..operators.versioned import _dir_may_match

            kept = []
            for d in dirs:
                s = stats.get(d) or stats_real.get(os.path.realpath(d))
                try:
                    keep = s is None or _dir_may_match(s, self._preds)
                except Exception:  # noqa: BLE001 - incomparable literal
                    keep = True
                if keep:
                    kept.append(d)
            dirs = kept
        dvs = self._table.deletion_vectors(self._version)
        cover = [
            (dv["path"], {os.path.realpath(c) for c in dv["covers"]})
            for dv in dvs
        ]
        pcover = [
            (dv["path"], {os.path.realpath(c) for c in dv["covers"]})
            for dv in self._table.position_dvs(self._version)
        ]
        parts = []
        for d in dirs:
            rd = os.path.realpath(d)
            covering = sorted(p for p, cs in cover if rd in cs)
            pcovering = sorted(
                _parquet_files(p)  # vector PART files, resolved at plan
                for p, cs in pcover
                if rd in cs
            )
            pflat = [f for fs in pcovering for f in fs]
            parts.extend(
                _BatchSlice(f, covering, pflat) for f in _parquet_files(d)
            )
        return parts or [_BatchSlice("", [], [])]

    def read(self, partition: _BatchSlice):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..operators.versioned import apply_position_mask

        tbl = pq.read_table(partition.path)
        if partition.pdv_paths:
            # POSITION vectors: per-file row mask — this task reads only
            # the positions covering ITS file (row-group pruning on the
            # sorted `file` column; the SHARED kernel, so this path and
            # the library read can never disagree)
            tbl = apply_position_mask(tbl, partition.path, partition.pdv_paths)
        cols = {}
        for field in self._arrow_schema:
            fname = self._phys.get(field.name, field.name)
            if fname in tbl.column_names:
                cols[field.name] = tbl.column(fname).cast(field.type)
            else:
                cols[field.name] = pa.nulls(tbl.num_rows, type=field.type)
        out = pa.table(cols, schema=self._arrow_schema)
        for dv_path in partition.dv_paths:
            dv = pq.read_table(dv_path)
            # DV files carry LOGICAL key names (delete_by_keys wrote
            # them); `out` is already logical, so the anti-join keys
            # line up. Cast DV key types to the table's (a widening
            # evolution can leave old DVs narrower).
            keys = [c for c in dv.column_names]
            dv = pa.table(
                {
                    c: dv.column(c).cast(out.schema.field(c).type)
                    for c in keys
                }
            )
            out = out.join(
                dv.group_by(keys).aggregate([]),  # distinct keys
                keys=keys,
                join_type="left anti",
            ).select([f.name for f in self._arrow_schema])
        out = out.cast(self._arrow_schema)
        yield from out.to_batches()


class VersionedCDFBatchReader(DataSourceReader):
    """BATCH change-feed read through the vanilla format reader
    (round-13 S54 — Delta's ``spark.read.format("delta")
    .option("readChangeFeed","true")``): plans exactly the per-commit
    cdf/insert slices the T23 stream plans (composition over the stream
    reader — one planning implementation, the two read paths cannot
    disagree) for the RANGE ``(startingVersion, endingVersion]``
    (exclusive-from, the same convention as the library
    ``read_changes_cdf`` and the stream offsets). Rows carry
    ``_change_type`` / ``_commit_version``; appends synthesize inserts,
    compact/zorder are skipped (dataChange=false), feed-less
    row-changing commits raise."""

    def __init__(self, schema, options):
        self._inner = VersionedCDFStreamReader(schema, options)
        head = self._inner._table.latest_version()
        if head is None:
            raise ValueError(
                f"versioned table at {self._inner._table.dir} has no commits"
            )
        self._v_from = int(options.get("startingversion", 0))
        ev = options.get("endingversion")
        self._v_to = int(ev) if ev is not None else head

    def partitions(self):
        slices = self._inner._delta_slices(self._v_from, self._v_to)
        parts = [sl for _v, ss in slices for sl in ss]
        return parts or [_CDFSlice("", 0, "insert")]

    def read(self, partition):
        yield from self._inner.read(partition)


class VersionedTableBatchSource(DataSource):
    """``spark.read/write.format("versioned_table")`` — the full BATCH
    DataSource over the versioned table format, so ANY Spark job (plain
    SQL users included) uses it without importing this library.

    READ (S45): snapshot reads, ``versionAsOf`` / ``timestampAsOf``
    time travel, recorded-schema scans with pre-evolution NULL-fill,
    column-mapping resolution, deletion-vector application (key-set
    anti-joins + per-file position masks), and manifest-stats dir
    pruning for pushed filters (filters are still re-applied by Spark —
    pruning only cuts I/O). Options: ``tableDir`` (required),
    ``versionAsOf`` (int), ``timestampAsOf`` (epoch seconds).

    WRITE (S49, round 13): ``df.write...mode("append"|"overwrite")``
    publishes a real commit through the manifest CAS with append
    auto-rebase, CHECK constraints, bucket layout, column mapping, and
    skipping stats; ``.option("mergeSchema","true")`` allows additive
    append evolution. STREAMING WRITE (T24):
    ``df.writeStream.format("versioned_table")`` commits one atomic
    append per micro-batch with ``#sbatch=`` exactly-once redelivery
    protection. See ``sources/versioned_sink.py`` for both."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def _cdf_mode(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower() == "true"
        )

    def schema(self):
        table_dir = self.options.get("tabledir") or self.options.get("path")
        if not table_dir:
            raise ValueError("versioned_table needs .option('tableDir', ...)")
        t = VersionedTable(None, table_dir)
        head = t.latest_version()  # checkpoint-bounded, O(tail)
        if head is None:
            raise ValueError(
                f"versioned table at {table_dir} has no commits"
            )
        v = self.options.get("versionasof")
        ts = self.options.get("timestampasof")
        if self._cdf_mode():
            if v is not None or ts is not None:
                raise ValueError(
                    "readChangeFeed takes startingVersion/endingVersion, "
                    "not versionAsOf/timestampAsOf (a feed is a range, "
                    "not a snapshot)"
                )
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            schema = t.snapshot_schema(head)
            if schema is None:
                raise ValueError(
                    f"versioned table at {table_dir} has no recorded "
                    "manifest schema (pre-tracking manifest)"
                )
            return StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        if ts is not None:
            version = t.version_at_timestamp(float(ts))
        elif v is not None:
            version = int(v)
            if not os.path.exists(
                os.path.join(t._versions, str(version))
            ):
                raise ValueError(
                    f"version {version} not committed at {table_dir} "
                    f"(have {t.versions()})"
                )
        else:
            version = head
        schema = t.snapshot_schema(version)
        if schema is None:
            raise ValueError(
                f"versioned table at {table_dir} version {version} has no "
                "recorded manifest schema (pre-tracking manifest)"
            )
        return schema

    def reader(self, schema):
        if self._cdf_mode():
            return VersionedCDFBatchReader(schema, self.options)
        return VersionedTableBatchReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        # round-13: the WRITE half — df.write.format("versioned_table")
        # .mode("append"|"overwrite").option("tableDir", ...).save()
        # stages per-task parquet through the S16 commit protocol and
        # publishes via the manifest CAS (see sources/versioned_sink.py)
        from .versioned_sink import VersionedTableWriter

        return VersionedTableWriter(schema, self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        # round-13 T24: the STREAMING write half — every micro-batch is
        # one atomic append commit, #sbatch-header idempotence against
        # foreachBatch-style redelivery (see sources/versioned_sink.py)
        if overwrite:
            raise ValueError(
                "versioned_table streaming sink supports append output "
                "mode only (complete-mode overwrite would rewrite the "
                "table every trigger)"
            )
        from .versioned_sink import VersionedTableStreamWriter

        return VersionedTableStreamWriter(schema, self.options, False)


def register(spark) -> None:
    """Register the three ``versioned_table*`` sources on the session.

    Documented side effect: enables the session-wide conf
    ``spark.sql.python.filterPushdown.enabled`` (runtime-mutable,
    default false) when it is not already on — the batch reader
    implements ``pushFilters()``, which pyspark refuses to PLAN while
    the conf is off, so a vanilla session (the driver contract) could
    not read the format at all. The conf affects every Python
    DataSource in the session, but only gates whether pushdown is
    OFFERED to them — a source that ignores/yields back its filters
    plans identically, so results never change. A value already set to
    ``true`` is left untouched."""
    spark.dataSource.register(VersionedTableStreamSource)
    spark.dataSource.register(VersionedCDFStreamSource)
    try:
        cur = spark.conf.get("spark.sql.python.filterPushdown.enabled")
    except Exception:  # noqa: BLE001 - conf not defined on this build
        cur = None
    if str(cur).lower() != "true":
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedTableBatchSource)
