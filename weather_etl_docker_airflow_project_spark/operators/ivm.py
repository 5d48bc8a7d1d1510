"""Incremental JOIN-view maintenance (the join sibling of the rollup IVM
in operators/rollup.py).

The 100 TB pattern: a materialized join view M = R ⋈ S over two append-only
feeds must never be recomputed from scratch. Under inserts the delta
algebra is exact::

    ΔM = (ΔR ⋈ S_old)  ∪  (R_old ⋈ ΔS)  ∪  (ΔR ⋈ ΔS)

so one maintenance step appends ΔM and folds the deltas into the
accumulated sides. Every term joins a (small) delta against an accumulated
table on the join key — with the accumulators bucketed on that key the
three delta joins are all co-located (zero wide shuffle of the big sides);
cost ∝ |Δ| × matched rows, never ∝ |R| + |S|. Deletes/updates need the
counting (multiplicity) extension — documented out of scope here, exactly
like the rollup's non-additive caveat.

Commit protocol (stage-then-manifest): each batch writes its ΔM/ΔR/ΔS
into batch-scoped directories in OVERWRITE mode, then lands a per-batch
manifest marker LAST. Readers union only manifested batches, so a failure
anywhere mid-batch leaves the view exactly at the previous batch boundary,
and replaying the torn batch overwrites its own partial output — never
double-counts (the r4 advice item: three raw appends with no atomicity
left a crashed batch permanently inconsistent). Manifest markers and
staging paths use the driver-visible filesystem — single-node/local-FS
here; on a real cluster point ``sink_dir`` at a shared filesystem (S3/
HDFS), where the same protocol holds (marker visibility is the commit).

Determinism: maintenance is pure relational algebra over exact values — no
floats are produced by the operator itself — so an N-batch replay is
row-identical to the one-shot join (``a21_incremental_join`` proves it
against a plain JOIN oracle; tests/test_ivm.py replays crafted batch
splits, including empty deltas, delta×delta matches, and a torn-batch
replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class JoinView:
    """Parquet-backed maintained join view. ``sink_dir`` holds three
    table families (``r_acc``, ``s_acc``, ``m_acc``), each a set of
    batch-scoped directories ``<family>/batch_<id>/``, plus a
    ``_commits/<id>`` manifest marker per durably applied batch. Each
    :meth:`apply_batch` runs the delta algebra above under the
    stage-then-manifest protocol; readers see exactly the committed
    prefix via :meth:`read`."""

    def __init__(self, spark: SparkSession, sink_dir: str, on: str):
        self.spark = spark
        self.dir = sink_dir
        self.on = on
        self._commits = os.path.join(sink_dir, "_commits")

    def _batch_path(self, family: str, batch_id: int) -> str:
        return os.path.join(self.dir, family, f"batch_{batch_id}")

    def committed_batches(self) -> list[int]:
        """Sorted ids of durably applied batches — the high-water mark is
        the last element. A batch id absent here was never applied or was
        torn mid-write; either way :meth:`apply_batch` with that id is
        safe to (re)run."""
        if not os.path.isdir(self._commits):
            return []
        return sorted(int(f) for f in os.listdir(self._commits) if f.isdigit())

    def _family_paths(self, family: str, committed: list[int]) -> list[str]:
        """Paths of every committed batch's data dir for one family. A
        manifest marker GUARANTEES the staged dirs exist (the marker lands
        last), so a committed-but-missing dir is corruption — raise loudly
        instead of silently serving a smaller-but-plausible view."""
        paths = [self._batch_path(family, b) for b in committed]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            raise ValueError(
                f"JoinView at {self.dir}: committed batch data missing for "
                f"{family}: {missing} — the sink was externally modified; "
                f"restore the batch dirs or rebuild the view"
            )
        return paths

    def _read_family(
        self, family: str, schema_of: DataFrame, committed: list[int]
    ) -> DataFrame:
        paths = self._family_paths(family, committed)
        if not paths:
            return self.spark.createDataFrame([], schema_of.schema)
        return self.spark.read.parquet(*paths)

    def apply_batch(
        self,
        delta_r: DataFrame,
        delta_s: DataFrame,
        batch_id: int | None = None,
    ) -> int:
        """One maintenance step; returns the batch id it committed (or
        found already committed — replaying a committed id is a no-op, so
        an at-least-once scheduler gets exactly-once view content). The
        deltas are localCheckpointed so the three delta joins and the two
        accumulator writes share one materialization."""
        committed = self.committed_batches()
        if batch_id is None:
            batch_id = committed[-1] + 1 if committed else 0
        elif batch_id in committed:
            return batch_id
        delta_r = delta_r.localCheckpoint()
        delta_s = delta_s.localCheckpoint()
        r_old = self._read_family("r_acc", delta_r, committed)
        s_old = self._read_family("s_acc", delta_s, committed)
        m_new = (
            delta_r.join(s_old, self.on)
            .unionByName(r_old.join(delta_s, self.on))
            .unionByName(delta_r.join(delta_s, self.on))
        )
        # STAGE: batch-scoped overwrite — a torn earlier attempt of this
        # id is replaced wholesale, never accreted onto. The three writes
        # are independent jobs over already-materialized inputs (the
        # deltas are checkpointed above), so they run CONCURRENTLY from a
        # small thread pool: each job's straggler tail back-fills with
        # the next job's tasks instead of idling the cluster (guide
        # §2.6); the manifest marker still lands strictly after all
        # three futures resolve, so commit semantics are unchanged.
        from concurrent.futures import ThreadPoolExecutor

        stage = [
            (m_new, self._batch_path("m_acc", batch_id)),
            (delta_r, self._batch_path("r_acc", batch_id)),
            (delta_s, self._batch_path("s_acc", batch_id)),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(
                    lambda df=df, path=path: df.write.mode(
                        "overwrite"
                    ).parquet(path)
                )
                for df, path in stage
            ]
            for fut in futures:
                fut.result()  # re-raises: a failed write aborts the batch
        # MANIFEST: the batch exists only once this marker lands. Written
        # tmp-then-rename (the HDFSMetadataLog/streaming CommitLog
        # pattern) with an fsync before the rename: an in-place open()/
        # write() could leave a partial-but-listed marker after an OS
        # crash, or become durable before the staged parquet under
        # filesystem reordering. committed_batches() ignores the tmp name
        # (isdigit filter), and os.rename is atomic within the directory.
        os.makedirs(self._commits, exist_ok=True)
        tmp = os.path.join(self._commits, f".{batch_id}.tmp")
        with open(tmp, "w") as f:
            f.write("committed")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self._commits, str(batch_id)))
        return batch_id

    def read(self) -> DataFrame:
        committed = self.committed_batches()
        paths = self._family_paths("m_acc", committed)
        if not paths:
            raise ValueError(f"JoinView at {self.dir} has no committed batches")
        return self.spark.read.parquet(*paths)
