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

Determinism: maintenance is pure relational algebra over exact values — no
floats are produced by the operator itself — so an N-batch replay is
row-identical to the one-shot join (``a21_incremental_join`` proves it
against a plain JOIN oracle; tests/test_ivm.py replays crafted batch
splits, including empty deltas and delta×delta matches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class JoinView:
    """Parquet-backed maintained join view. ``sink_dir`` holds three
    tables: ``r_acc``, ``s_acc`` (accumulated inputs) and ``m_acc`` (the
    materialized join). Each ``apply_batch`` runs the delta algebra above
    and appends; readers see the view via :meth:`read`."""

    def __init__(self, spark: SparkSession, sink_dir: str, on: str):
        self.spark = spark
        self.dir = sink_dir
        self.on = on

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _read(self, name: str, schema_of: DataFrame) -> DataFrame:
        p = self._path(name)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return self.spark.read.parquet(p)
        return self.spark.createDataFrame([], schema_of.schema)

    def apply_batch(self, delta_r: DataFrame, delta_s: DataFrame) -> None:
        """One maintenance step. The deltas are localCheckpointed so the
        three delta joins and the two accumulator appends share one
        materialization (and the append below can't re-read a moving
        input)."""
        delta_r = delta_r.localCheckpoint()
        delta_s = delta_s.localCheckpoint()
        r_old = self._read("r_acc", delta_r)
        s_old = self._read("s_acc", delta_s)
        m_new = (
            delta_r.join(s_old, self.on)
            .unionByName(r_old.join(delta_s, self.on))
            .unionByName(delta_r.join(delta_s, self.on))
        )
        # append ΔM first (reads r_acc/s_acc BEFORE they grow), then fold
        # the deltas into the accumulators
        m_new.write.mode("append").parquet(self._path("m_acc"))
        delta_r.write.mode("append").parquet(self._path("r_acc"))
        delta_s.write.mode("append").parquet(self._path("s_acc"))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._path("m_acc"))
