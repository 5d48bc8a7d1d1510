"""Versioned parquet table with time travel — the mini-lakehouse core
(snapshot isolation + read-old-versions) built from primitives, since the
container ships no Delta/Iceberg (documented environment limit; with a
real table format this module collapses to `VERSION AS OF`).

Layout under ``table_dir``::

    data/batch_<version>_<salt>/   immutable parquet fragments
    _versions/<n>                  manifest: newline list of data dirs

The rules that make this a real table format in miniature:

- **Data files are immutable.** A commit only ADDS a batch dir; nothing
  under ``data/`` is ever rewritten, so readers of any version are never
  disturbed by writers (snapshot isolation by construction).
- **The manifest IS the commit.** Version ``n``'s manifest lists exactly
  the batch dirs whose union is that snapshot; it is written
  tmp+fsync+rename (the JoinView/HDFSMetadataLog pattern), so a torn
  commit leaves no visible version and replaying it overwrites its own
  staging, never double-counts.
- **Append commits cost O(delta)**: manifest n+1 = manifest n + the new
  batch dir. Overwrite commits write one batch and a manifest that lists
  only it — old data dirs stay for the old versions' readers until
  :func:`vacuum` retires them under an explicit retention window.
- **Time travel is manifest selection**: ``read(version=k)`` unions
  version k's dirs; latest = highest manifest. At 100 TB the manifest
  holds directory paths, not file lists — listing stays proportional to
  the version's batch count.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first. The losing commit
    changed nothing visible (its staged batch dir is unreferenced and the
    next :func:`vacuum` removes it); re-calling :meth:`VersionedTable.commit`
    re-reads the latest version and retries against it — the standard
    optimistic-concurrency loop."""


class ConstraintViolation(ValueError):
    """A commit's batch contained rows failing a table CHECK constraint.
    Nothing became visible: constraints are evaluated in the SAME pass
    that writes the batch (``df.observe`` — zero extra jobs), and the
    manifest is only published afterwards, so a violating commit is a
    torn commit — its staged batch dir is unreferenced and the next
    :func:`vacuum` reclaims it."""


class VersionedTable:
    def __init__(self, spark: SparkSession, table_dir: str):
        self.spark = spark
        self.dir = table_dir
        self._versions = os.path.join(table_dir, "_versions")
        self._data = os.path.join(table_dir, "data")
        self._constraints_file = os.path.join(table_dir, "_constraints")

    def set_constraints(self, exprs: list[str]) -> None:
        """Declare table-level CHECK constraints (Delta's ``ALTER TABLE
        ADD CONSTRAINT ... CHECK`` in miniature): SQL boolean expressions
        every subsequently committed row must satisfy. SQL CHECK
        semantics — a row violates only when the expression is FALSE;
        UNKNOWN/NULL satisfies (enforce non-nullness with an explicit
        ``IS NOT NULL`` constraint). Persisted tmp+fsync+rename like the
        manifests; pass ``[]`` to drop all constraints."""
        os.makedirs(self.dir, exist_ok=True)
        tmp = self._constraints_file + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(exprs) + ("\n" if exprs else ""))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._constraints_file)

    def constraints(self) -> list[str]:
        if not os.path.exists(self._constraints_file):
            return []
        with open(self._constraints_file) as f:
            return [line.strip() for line in f if line.strip()]

    def versions(self) -> list[int]:
        """Sorted committed version numbers (manifest presence = commit)."""
        if not os.path.isdir(self._versions):
            return []
        return sorted(int(f) for f in os.listdir(self._versions) if f.isdigit())

    def _manifest(self, version: int) -> list[str]:
        with open(os.path.join(self._versions, str(version))) as f:
            return [line.strip() for line in f if line.strip()]

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        expected_base_version: int | None = None,
    ) -> int:
        """Write ``df`` as a new immutable batch and publish the next
        version. ``mode='append'`` extends the previous version's
        manifest; ``mode='overwrite'`` starts the new version from just
        this batch (old versions stay readable).

        Concurrency: publication is optimistic CAS — the manifest lands
        via atomic create-if-absent (``os.link``), so when two writers
        race for the same version number exactly one wins and the other
        gets :class:`ConcurrentCommitError` (retry = call commit again;
        it re-reads the latest manifest). A plain rename would silently
        REPLACE the winner's manifest and lose its batch from every
        later version. Requires a store with atomic put-if-absent
        (POSIX link, HDFS create, S3 If-None-Match / DynamoDB lock —
        the same substrate Delta's commit protocol needs).

        ``expected_base_version`` is the read-modify-write guard: a
        writer that READ version B to produce ``df`` (compaction, any
        future MERGE) passes B, and the commit publishes B+1 or raises
        :class:`ConcurrentCommitError` — never a later number. Without
        it, a concurrent append landing between that writer's read and
        its publish would get a LOWER version than the rewrite, and the
        rewrite's snapshot would silently drop the append's rows (the
        exact conflict Delta's OPTIMIZE detects). Pinning the version
        number makes the ``os.link`` CAS itself the conflict detector:
        the interloper's B+1 manifest makes ours lose the link race.
        Blind appends (no read dependency) keep passing None — they
        commute with any interleaving, so last-reader-wins numbering is
        correct for them."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        existing = self.versions()
        if expected_base_version is not None:
            base = existing[-1] if existing else 0
            if base != expected_base_version:
                raise ConcurrentCommitError(
                    f"commit at {self.dir} expected base version "
                    f"{expected_base_version} but latest is {base}: a "
                    "concurrent commit landed after this writer's read; "
                    "re-read and retry"
                )
            version = expected_base_version + 1
        else:
            version = (existing[-1] + 1) if existing else 1
        batch = os.path.join(self._data, f"batch_{version}_{uuid.uuid4().hex[:8]}")
        checks = self.constraints()
        obs = None
        if checks:
            # CHECK enforcement in the SAME pass as the batch write
            # (df.observe piggybacks on the write job — no second scan
            # of a 100 TB batch). Violation semantics: FALSE violates,
            # UNKNOWN satisfies (SQL/Delta CHECK). On violation the
            # batch is already on disk but the manifest below is never
            # published — torn-commit invisibility does the rollback.
            from functools import reduce

            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            viol = reduce(
                lambda a, b: a | b,
                [F.expr(f"NOT coalesce(({c}), true)") for c in checks],
            )
            obs = Observation(f"constraints_{uuid.uuid4().hex[:8]}")
            df = df.observe(obs, F.sum(viol.cast("long")).alias("n_bad"))
        df.write.mode("overwrite").parquet(batch)
        if obs is not None and (obs.get["n_bad"] or 0) > 0:
            raise ConstraintViolation(
                f"commit at {self.dir} rejected: {obs.get['n_bad']} row(s) "
                f"violate CHECK constraints {checks}; no version was "
                "published (the staged batch is unreferenced — vacuum "
                "reclaims it)"
            )
        dirs = (
            (self._manifest(existing[-1]) if existing and mode == "append" else [])
            + [batch]
        )
        os.makedirs(self._versions, exist_ok=True)
        tmp = os.path.join(self._versions, f".{version}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(dirs) + "\n")
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self._versions, str(version))
        try:
            os.link(tmp, final)  # atomic create-if-absent: loser raises
        except FileExistsError:
            os.remove(tmp)
            raise ConcurrentCommitError(
                f"version {version} at {self.dir} was published by another "
                "writer; retry commit() against the new latest version "
                "(this writer's staged batch is unreferenced and will be "
                "vacuumed)"
            ) from None
        os.remove(tmp)
        # Durability caveat: the MANIFEST is fsynced before the rename,
        # but the batch parquet underneath rides the filesystem's own
        # durability (Spark does not fsync local-FS data files) — after a
        # power loss a visible version can reference not-yet-durable
        # data. On HDFS/S3 the store's write visibility covers this; on
        # local FS it is the same contract every local parquet write has.
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: the union of the version's batch dirs (latest
        committed version when ``version`` is None)."""
        committed = self.versions()
        if not committed:
            raise ValueError(f"versioned table at {self.dir} has no commits")
        v = committed[-1] if version is None else version
        if v not in committed:
            raise ValueError(
                f"version {v} not committed at {self.dir} (have {committed})"
            )
        return self.spark.read.parquet(*self._manifest(v))

    def read_changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Incremental scan: the rows ADDED between ``v_from`` (exclusive)
        and ``v_to`` (inclusive; latest when None) — the change-data-feed
        read every incremental consumer (downstream ETL, IVM, streaming
        backfill) wants instead of a full-snapshot diff.

        Because commits are immutable batch dirs and an append manifest is
        a superset of its parent, the delta is pure MANIFEST set
        difference: only the batch dirs committed after ``v_from`` are
        opened, so the scan costs O(changed data), never O(table) — at
        100 TB, consuming a day's appends reads a day's files. Raises if
        the range crosses an ``overwrite`` commit (the newer manifest no
        longer contains the older one's dirs — the diff is not
        expressible as added files; consumers must re-read the snapshot,
        same contract as Delta's CDF on non-append commits)."""
        committed = self.versions()
        if v_to is None:
            v_to = committed[-1] if committed else 0
        for v in (v_from, v_to):
            if v not in committed:
                raise ValueError(
                    f"version {v} not committed at {self.dir} (have {committed})"
                )
        if v_to < v_from:
            raise ValueError(f"v_to {v_to} < v_from {v_from}")
        from_dirs = set(self._manifest(v_from))
        to_dirs = self._manifest(v_to)
        if not from_dirs <= set(to_dirs):
            raise ValueError(
                f"versions {v_from}..{v_to} at {self.dir} cross an overwrite "
                "commit; the delta is not an append set — re-read the snapshot"
            )
        new_dirs = [d for d in to_dirs if d not in from_dirs]
        if not new_dirs:
            return self.read(version=v_to).limit(0)  # schema-only, no data
        return self.spark.read.parquet(*new_dirs)

    def read_changes_cdc(
        self,
        v_from: int,
        v_to: int | None = None,
        keys: list[str] | None = None,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """ROW-LEVEL change feed across ANY commit sequence — the r8
        verdict's extension of :meth:`read_changes`, which (correctly,
        per the Delta-CDF contract) refuses ranges crossing an overwrite
        commit because a file-level delta cannot express them. When the
        table has a KEY, row-level changes across an overwrite ARE
        well-defined: this walks the commits one version at a time and
        emits ``(keys..., change_type, commit_version)`` per commit:

        - an APPEND commit contributes its new batch dirs' keys as
          ``insert`` — resolved by pure manifest set difference, so the
          append path still opens O(delta) files and never touches the
          older snapshot;
        - an OVERWRITE commit contributes the keyed snapshot diff
          (:func:`~..operators.cdc.snapshot_diff`) of version v-1 vs v —
          ``insert`` / ``update`` (fingerprint of ``compare_cols``
          changed) / ``delete``. This is the one place the feed pays two
          snapshot reads; that cost is intrinsic (the commit itself
          rewrote the table) and matches what Delta charges when CDF
          files are absent.

        The un-keyable case keeps the refusal: with no ``keys`` there is
        no row identity to diff on, so crossing an overwrite raises just
        like :meth:`read_changes` (use it directly for append-only
        ranges). ``compare_cols`` defaults to all non-key columns.

        Per-commit granularity (not a net v_from→v_to collapse) is
        deliberate: consumers replaying into a sink need the commit
        boundaries, and a net diff is one ``groupBy(keys).max(version)``
        away for those that don't."""
        committed = self.versions()
        if v_to is None:
            v_to = committed[-1] if committed else 0
        for v in (v_from, v_to):
            if v not in committed:
                raise ValueError(
                    f"version {v} not committed at {self.dir} (have {committed})"
                )
        if v_to < v_from:
            raise ValueError(f"v_to {v_to} < v_from {v_from}")
        from pyspark.sql import functions as F

        from .cdc import snapshot_diff

        parts: list[DataFrame] = []
        span = [v for v in committed if v_from <= v <= v_to]
        for prev_v, v in zip(span, span[1:]):
            prev_dirs = set(self._manifest(prev_v))
            to_dirs = self._manifest(v)
            if prev_dirs <= set(to_dirs):  # append commit
                new_dirs = [d for d in to_dirs if d not in prev_dirs]
                if not new_dirs:
                    continue
                batch = self.spark.read.parquet(*new_dirs)
                if keys is None:
                    raise ValueError(
                        "read_changes_cdc needs keys=[...] for row-level "
                        "changes; for file-level append deltas use "
                        "read_changes()"
                    )
                parts.append(
                    batch.select(
                        *keys,
                        F.lit("insert").alias("change_type"),
                        F.lit(v).cast("long").alias("commit_version"),
                    )
                )
            else:  # overwrite commit: keyed row diff or refuse
                if keys is None:
                    raise ValueError(
                        f"versions {prev_v}..{v} at {self.dir} cross an "
                        "overwrite commit and no keys were given — row "
                        "identity is undefined; pass keys=[...] or re-read "
                        "the snapshot"
                    )
                old = self.read(version=prev_v)
                new = self.read(version=v)
                cmp_cols = compare_cols or [
                    c for c in new.columns if c not in keys
                ]
                parts.append(
                    snapshot_diff(old, new, keys, cmp_cols).withColumn(
                        "commit_version", F.lit(v).cast("long")
                    )
                )
        if not parts:
            if keys is None:
                raise ValueError(
                    "read_changes_cdc needs keys=[...] for row-level changes"
                )
            return (
                self.read(version=v_to)
                .select(
                    *keys,
                    F.lit("insert").alias("change_type"),
                    F.lit(0).cast("long").alias("commit_version"),
                )
                .limit(0)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out


class _CompactReport:
    def __init__(self, version: int, files_before: int, files_after: int):
        self.version = version
        self.files_before = files_before
        self.files_after = files_after


def compact(
    table: VersionedTable, target_file_bytes: int = 128 * 1024 * 1024
) -> _CompactReport:
    """OPTIMIZE for :class:`VersionedTable` — the small-file compaction
    completing the lakehouse lifecycle (commit → read → time-travel →
    change feed → CDC → vacuum → COMPACT). Many small appends leave the
    latest version scattered across tiny parquet fragments; at 100 TB
    that is the classic small-file problem (every scan pays per-file
    open/footer costs, the driver pays per-file listing). Compaction
    reads the latest snapshot, coalesces it to
    ``ceil(bytes / target_file_bytes)`` partitions, and publishes the
    rewrite as a normal OVERWRITE commit — one new batch dir, identical
    rows.

    Everything rides the existing commit machinery, so every invariant
    holds by construction: old versions stay readable (immutability), a
    torn compaction leaves no visible version, and :func:`vacuum`
    retires the fragment dirs once the retention window passes.
    Compaction is a READ-MODIFY-WRITE, so the bare manifest CAS is not
    enough on its own: a concurrent append landing between our read and
    our publish would take a lower version number and be silently erased
    by the rewrite's snapshot. The base version captured before the read
    is therefore passed as ``expected_base_version`` — the commit
    publishes exactly base+1 or raises :class:`ConcurrentCommitError`
    (rows unchanged by definition, so retrying compact() is always
    safe) — the same conflict rule Delta's OPTIMIZE enforces. Because the rewrite changes NO rows,
    ``read_changes_cdc`` across the compaction commit emits an EMPTY
    keyed diff (pytest-pinned) — consumers see a version bump, zero
    changes; file-level ``read_changes`` refuses the range exactly as
    for any overwrite (correct: the delta is not an append set).

    ``coalesce`` (narrow, no shuffle), not ``repartition``: merging
    fragments needs no redistribution, and a full shuffle of a 100 TB
    table to fix file sizes would be the tail wagging the dog. The
    trade — coalesced partitions inherit input skew — is acceptable for
    a maintenance job whose goal is fewer, bigger files. Sizing walks
    the local filesystem (the FS-listing cost every OPTIMIZE pays; on
    HDFS/S3 swap in the FileSystem API)."""
    committed = table.versions()
    if not committed:
        raise ValueError(f"versioned table at {table.dir} has no commits")
    base_version = committed[-1]
    dirs = table._manifest(base_version)
    total_bytes = 0
    n_files = 0
    for d in dirs:
        for root, _sub, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    total_bytes += os.path.getsize(os.path.join(root, f))
                    n_files += 1
    n_parts = max(1, -(-total_bytes // target_file_bytes))  # ceil
    df = table.read(version=base_version)
    version = table.commit(
        df.coalesce(n_parts),
        mode="overwrite",
        expected_base_version=base_version,
    )
    after_dirs = table._manifest(version)
    n_after = sum(
        1
        for d in after_dirs
        for _root, _sub, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )
    return _CompactReport(version, n_files, n_after)


class _VacuumReport:
    def __init__(self, dropped_versions: list[int], removed_dirs: list[str]):
        self.dropped_versions = dropped_versions
        self.removed_dirs = removed_dirs


def vacuum(table: VersionedTable, retain_versions: int = 1) -> _VacuumReport:
    """Retention job for :class:`VersionedTable`: keep the newest
    ``retain_versions`` versions, drop older manifests, and delete the
    data batch dirs no retained manifest references — the standard
    lakehouse VACUUM, completing commit → read → time-travel → retain.

    Safety order matters: old MANIFESTS are removed first (so no reader
    can resolve a version whose data is about to go), THEN the
    now-unreferenced batch dirs. A dir referenced by ANY retained
    manifest is never touched, so `read()` on every surviving version is
    unaffected. Idempotent: re-running vacuums nothing new.

    Retention windows vs in-flight readers: like every lakehouse vacuum,
    a reader holding a dropped version's plan can fail mid-scan — size
    ``retain_versions`` above the longest reader, the same contract as
    Delta's retention interval."""
    import shutil

    if retain_versions < 1:
        raise ValueError("retain_versions must be >= 1")
    committed = table.versions()
    keep = committed[-retain_versions:]
    drop = [v for v in committed if v not in keep]
    referenced = set()
    for v in keep:
        referenced.update(table._manifest(v))
    # realpath-normalize BOTH sides of the membership test: a handle
    # opened through a relative/symlinked/denormalized spelling of
    # table_dir must never conclude that every dir is unreferenced and
    # delete data retained manifests still point at
    referenced_real = {os.path.realpath(p) for p in referenced}
    removed: list[str] = []
    for v in drop:
        os.remove(os.path.join(table._versions, str(v)))
    data_root = table._data
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if os.path.realpath(full) not in referenced_real:
                shutil.rmtree(full)
                removed.append(full)
    return _VacuumReport(drop, removed)


def merge_upsert(
    table: VersionedTable,
    source: DataFrame,
    keys: list[str],
    validate_source_keys: bool = True,
    when_matched_condition: str | None = None,
) -> int:
    """MERGE INTO for :class:`VersionedTable` — row-level upsert with
    lakehouse semantics (Delta's ``WHEN MATCHED THEN UPDATE SET * WHEN
    NOT MATCHED THEN INSERT *``; reference parity: the anti-join upsert
    at ``operators/upsert.py`` re-expresses the DAG's per-record
    INSERT-or-skip, and this is its update-capable lakehouse twin).

    Copy-on-write, one declarative plan: the new snapshot is
    ``source UNION (target LEFT ANTI source ON keys)`` — matched target
    rows are replaced wholesale by their source row, unmatched source
    rows are inserted, everything else carries over. One shuffle on the
    merge keys (the anti join); at 100 TB both sides hash-partition on
    the same keys and AQE handles skew, exactly like any big equi-join.
    A key-bucketed table layout would make it co-located; partial-file
    rewrite (only files containing matched keys, Delta's actual
    copy-on-write) is the refinement when the matched set is sparse —
    the commit contract is identical.

    Read-modify-write safety: the base version is captured BEFORE the
    target read and pinned through ``expected_base_version``, so a
    concurrent append landing mid-merge fails THIS commit with
    :class:`ConcurrentCommitError` (re-run to retry against the new
    base) instead of being silently erased by the rewrite — the same
    conflict rule as :func:`compact`.

    ``validate_source_keys``: Delta raises when multiple source rows
    match one target row (the merge would be ambiguous); one count
    vs distinct-count job enforces the same contract here.
    """
    if not keys:
        raise ValueError("merge_upsert needs at least one merge key")
    committed = table.versions()
    if not committed:
        raise ValueError(f"versioned table at {table.dir} has no commits")
    base_version = committed[-1]
    target = table.read(version=base_version)
    missing = [k for k in keys if k not in source.columns]
    if missing or set(source.columns) != set(target.columns):
        raise ValueError(
            f"merge source columns {sorted(source.columns)} must equal "
            f"target columns {sorted(target.columns)} and contain the "
            f"merge keys {keys}"
        )
    if validate_source_keys:
        from pyspark.sql import functions as F

        # count_distinct ignores NULLs, so restrict the duplicate check
        # to non-NULL-key rows: a NULL merge key never equi-matches any
        # target row (standard SQL MERGE: NOT MATCHED -> plain insert),
        # so NULL-key source rows are legal and must not trip the
        # ambiguity error — only true key collisions are ambiguous.
        nonnull = source
        for k in keys:
            nonnull = nonnull.filter(F.col(k).isNotNull())
        n, nd = nonnull.agg(
            F.count(F.lit(1)), F.count_distinct(*[F.col(k) for k in keys])
        ).first()
        if n != nd:
            raise ValueError(
                f"merge source has {n - nd} duplicate merge-key rows: a "
                "target row would match multiple source rows (ambiguous "
                "merge, the Delta error contract)"
            )
    if when_matched_condition is None:
        survivors = target.join(source.select(*keys), keys, "left_anti")
        merged = source.select(*target.columns).unionByName(survivors)
    else:
        # Conditional merge (Delta's WHEN MATCHED AND <cond> THEN UPDATE
        # SET * / WHEN NOT MATCHED THEN INSERT *): the condition is a
        # SQL boolean over aliases ``s`` (source) and ``t`` (target),
        # e.g. ``s.event_id > t.event_id`` — the standard CDC
        # keep-the-latest merge. A matched target row whose condition
        # is FALSE/UNKNOWN is carried over untouched; unmatched source
        # rows still insert. Same shuffle shape: every join keys on the
        # merge keys.
        from pyspark.sql import functions as F

        s, t = source.alias("s"), target.alias("t")
        # plain equality (NULL never matches), consistent with the
        # unconditional path's anti-join semantics and SQL MERGE ON
        on = [F.col(f"s.{k}") == F.col(f"t.{k}") for k in keys]
        cond = F.expr(when_matched_condition)
        upd = (
            t.join(s, on, "inner")
            .filter(cond)
            .select([F.col(f"s.{c}").alias(c) for c in target.columns])
        )
        keep_t = target.join(upd.select(*keys), keys, "left_anti")
        ins = source.join(target.select(*keys), keys, "left_anti")
        merged = keep_t.unionByName(upd).unionByName(
            ins.select(*target.columns)
        )
    return table.commit(
        merged, mode="overwrite", expected_base_version=base_version
    )


def clone(
    table: VersionedTable, target_dir: str, version: int | None = None
) -> VersionedTable:
    """SHALLOW CLONE — a new :class:`VersionedTable` whose first version
    REFERENCES the source's batch dirs, copying zero data (Delta's
    ``CREATE TABLE ... SHALLOW CLONE``, the zero-copy dev/test-branch
    primitive; at 100 TB a clone is a metadata write, not a 100 TB
    copy). The clone's manifest lists the source version's batch dirs
    verbatim — valid because data files are immutable by the table
    contract — and subsequent commits to the clone stage their batches
    under the CLONE's own ``data/``, so writes diverge without ever
    touching the source (copy-on-write at batch granularity).

    The standard shallow-clone caveat applies and is inherited
    deliberately: :func:`vacuum` on the SOURCE retires dirs the clone
    may still reference (Delta documents the same hazard). Deep-clone =
    clone + :func:`compact` (the rewrite re-homes every row into the
    clone's own storage).
    """
    committed = table.versions()
    if not committed:
        raise ValueError(f"versioned table at {table.dir} has no commits")
    v = committed[-1] if version is None else version
    if v not in committed:
        raise ValueError(
            f"version {v} not committed at {table.dir} (have {committed})"
        )
    target = VersionedTable(table.spark, target_dir)
    if target.versions():
        raise ValueError(f"clone target {target_dir} already has commits")
    dirs = table._manifest(v)
    os.makedirs(target._versions, exist_ok=True)
    tmp = os.path.join(target._versions, ".1.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(os.path.realpath(d) for d in dirs) + "\n")
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(target._versions, "1")
    try:
        os.link(tmp, final)  # same atomic create-if-absent as commit()
    except FileExistsError:
        os.remove(tmp)
        raise ConcurrentCommitError(
            f"clone target {target_dir} version 1 was published by "
            "another writer"
        ) from None
    os.remove(tmp)
    return target


def replicate_changes(
    source: VersionedTable,
    target: VersionedTable,
    v_from: int,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> int:
    """Change-feed CONSUMER: replay the source table's commits after
    ``v_from`` into ``target`` — the sink half of the CDC story
    (read_changes_cdc is the producer half; together they are the
    standard lakehouse replication loop: feed → MERGE per commit).
    ``target`` must hold the source's ``v_from`` snapshot (start with
    :func:`clone` + :func:`compact`, or any equal copy).

    Per source commit, in commit order (the feed's per-commit
    granularity exists exactly for this):

    - ``insert``/``update`` keys are joined back to THAT source
      version's snapshot for payloads (the feed itself is keys-only —
      O(changes) rows on the wire; payload attach is one keyed
      semi-join against the pinned snapshot) and applied with
      :func:`merge_upsert` — so each replayed commit inherits the
      read-modify-write conflict guard on the target.
    - ``delete`` keys are applied as an anti-join overwrite commit,
      pinned to the target base version the deletes were computed
      against (same guard).

    Returns the target's final version. Replay cost is O(changed rows +
    one snapshot semi-join per replayed commit) — never a full-history
    copy; commits with no changes for a leg publish nothing for it."""
    from pyspark.sql import functions as F

    feed = source.read_changes_cdc(
        v_from=v_from, keys=keys, compare_cols=compare_cols
    )
    commits = sorted(
        r["commit_version"]
        for r in feed.select("commit_version").distinct().collect()
    )
    final_version = target.versions()[-1]
    for v in commits:
        batch = feed.filter(F.col("commit_version") == v)
        upsert_keys = batch.filter(
            F.col("change_type").isin("insert", "update")
        ).select(*keys)
        delete_keys = batch.filter(F.col("change_type") == "delete").select(
            *keys
        )
        if upsert_keys.limit(1).count():
            payload = source.read(version=v).join(
                upsert_keys, keys, "left_semi"
            )
            final_version = merge_upsert(target, payload, keys=keys)
        if delete_keys.limit(1).count():
            base = target.versions()[-1]
            kept = target.read(version=base).join(
                delete_keys, keys, "left_anti"
            )
            final_version = target.commit(
                kept, mode="overwrite", expected_base_version=base
            )
    return final_version
