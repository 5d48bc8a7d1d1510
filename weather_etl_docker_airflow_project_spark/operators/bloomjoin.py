"""Bloom-filter-pruned joins (SURVEY.md §2.12 J13).

The runtime-filter shape every warehouse engine applies to selective
joins: build a Bloom filter over the (small) build side's join keys, test
every probe-side row against it MAP-SIDE before the shuffle, then run the
exact join on the survivors. At 100 TB the win is that the probe fact
table sheds non-matching rows at the scan — the shuffle moves only rows
that *might* join (false-positive rate ``~0.1%`` at the default sizing)
instead of the whole table. Spark's own InjectRuntimeFilter does this for
some plans; this operator makes the technique explicit, tunable, and
available to any DataFrame pair.

Exactness: the Bloom filter can only pass non-matching rows (false
positives), never drop matching ones (no false negatives, asserted by
test). Callers compose it with the exact join, so the declared result is
identical to the unpruned plan — the filter is pure plan shape, which is
why the DuckDB oracle for ``j13_bloom_pruned_join`` is the plain join.

Mechanics: positions come from a multiply-shift family over uint64
(``((key+1) * A_i) >> (64 - log2_m)`` with odd md5-derived constants —
wraparound multiply is well-defined in numpy uint64), computed in the SAME
Arrow-vectorized code path on both build and probe sides. The build side
aggregates bit positions into 64-bit words distributed (map-side
``bit_or`` partials), so the driver only ever collects the bitmap itself:
``m / 64`` words (128 KiB at the default ``log2_m=20``) — sketch-sized,
like the PQ codebooks and IVF seed collects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xhash import h32_py

DEFAULT_LOG2_M = 20  # 1 Mi bits = 128 KiB bitmap
DEFAULT_N_HASHES = 5


def _hash_constants(n_hashes: int) -> np.ndarray:
    """Odd 64-bit multipliers for the multiply-shift family, derived from
    md5 so every session/engine/test sees the same filter."""
    return np.array(
        [
            (np.uint64(h32_py(f"bloomA:{i}")) << np.uint64(32))
            | np.uint64(h32_py(f"bloomB:{i}"))
            | np.uint64(1)
            for i in range(n_hashes)
        ],
        dtype=np.uint64,
    )


def _positions(keys: np.ndarray, consts: np.ndarray, log2_m: int) -> np.ndarray:
    """(n,) int64 keys -> (n, n_hashes) uint64 bit positions."""
    shift = np.uint64(64 - log2_m)
    k = (keys.astype(np.uint64) + np.uint64(1))[:, None]
    return (k * consts[None, :]) >> shift


def positions_udf(log2_m: int = DEFAULT_LOG2_M, n_hashes: int = DEFAULT_N_HASHES):
    """Arrow UDF: long key -> array<long> of Bloom bit positions."""
    consts = _hash_constants(n_hashes)

    @F.pandas_udf("array<long>")
    def _pos(keys: pd.Series) -> pd.Series:
        if not len(keys):
            return pd.Series([], dtype=object)
        pos = _positions(keys.to_numpy(dtype=np.int64), consts, log2_m)
        return pd.Series(list(pos.astype(np.int64)))

    return _pos


def build_bloom_bitmap(
    build: DataFrame,
    key_col: str,
    log2_m: int = DEFAULT_LOG2_M,
    n_hashes: int = DEFAULT_N_HASHES,
) -> np.ndarray:
    """Distributed Bloom build: returns the bitmap as ``m/64`` uint64
    words. The only driver-side materialization is the word table
    (``<= m/64`` rows), never the build keys."""
    pos = positions_udf(log2_m, n_hashes)
    words_df = (
        # NULL keys never equi-join, so dropping them from the build is
        # exact (and keeps the Arrow UDF free of NaN->int casts).
        build.filter(F.col(key_col).isNotNull())
        .select(F.explode(pos(F.col(key_col).cast("long"))).alias("p"))
        .select(
            F.shiftright("p", 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    bitmap = np.zeros(1 << (log2_m - 6), dtype=np.uint64)
    # Arrow columnar collect, not Row collect: a large filter (log2_m=30
    # for a 10^8-key build, r10's wedge-stream use) has up to m/64 = 16M
    # nonzero words — Row objects there cost ~GBs of driver Python heap,
    # the Arrow table ~260 MB. bit_or returns signed BIGINT; a word with
    # bit 63 set comes back negative, so reinterpret the two's-complement
    # bits rather than value-convert (np.uint64(negative) raises on
    # NumPy >= 2.0).
    tbl = words_df.toArrow()
    idx = tbl.column("word_idx").to_numpy().astype(np.int64)
    bits = tbl.column("bits").to_numpy().astype(np.int64).view(np.uint64)
    bitmap[idx] = bits
    return bitmap


def might_contain_udf(
    bitmap,
    log2_m: int = DEFAULT_LOG2_M,
    n_hashes: int = DEFAULT_N_HASHES,
):
    """Arrow UDF: long key -> boolean (no false negatives). NULL keys test
    False — a NULL never equi-joins, so pruning it is exact.

    ``bitmap`` is either the ndarray itself (fine at the default 128 KiB
    sizing) or a ``SparkContext.broadcast`` of it. LARGE bitmaps MUST go
    through a broadcast: a closure-embedded ndarray is re-shipped and
    re-unpickled through the worker pipe for EVERY task — at the r10
    wedge-stream sizing (log2_m=30, 128 MiB) 32 concurrent tasks
    streaming 128 MiB commands crashed the Python workers outright; a
    broadcast is fetched once per worker process and cached across
    tasks."""
    consts = _hash_constants(n_hashes)
    from pyspark.broadcast import Broadcast

    @F.pandas_udf("boolean")
    def _test(keys: pd.Series) -> pd.Series:
        bm = bitmap.value if isinstance(bitmap, Broadcast) else bitmap
        if not len(keys):
            return pd.Series([], dtype=bool)
        valid = keys.notna().to_numpy()
        kv = keys.fillna(0).to_numpy(dtype=np.int64)
        pos = _positions(kv, consts, log2_m)
        words = bm[pos >> np.uint64(6)]
        bits = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return pd.Series(bits.all(axis=1) & valid)

    return _test


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: np.ndarray,
    log2_m: int = DEFAULT_LOG2_M,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Map-side Bloom filter on ``probe[key_col]`` — rows that cannot
    join are dropped before any shuffle; possible matches pass through."""
    test = might_contain_udf(bitmap, log2_m, n_hashes)
    return probe.filter(test(F.col(key_col).cast("long")))


def bloom_pruned_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    log2_m: int = DEFAULT_LOG2_M,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exact left-semi join with Bloom pre-pruning: identical rows to
    ``probe SEMI JOIN build``, but only Bloom survivors reach the join.
    The build side is scanned twice (bitmap + join); at 100 TB the build
    side is the small one by construction, and the probe side — the
    expensive scan — streams through the filter exactly once."""
    bitmap = build_bloom_bitmap(build, build_key, log2_m, n_hashes)
    pruned = bloom_prune(probe, probe_key, bitmap, log2_m, n_hashes)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(F.broadcast(keys), probe_key, "left_semi")
