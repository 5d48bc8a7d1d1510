"""Spark-compatible xxHash64 in pure Python/NumPy — the hash behind
``F.xxhash64`` (seed 42, per-column chaining), reimplemented from the
public xxHash specification so EXECUTOR-side Python (the vanilla
``df.write.format("versioned_table")`` sink, which has no SparkSession)
can compute the SAME key-bucket ids the layout-aware library writer
computes with column expressions (``versioned._bucket_column``:
``pmod(xxhash64(keys...), n_buckets)``).

Compatibility contract (property-tested against ``F.xxhash64`` in
``tests/test_round13_sink.py``):

- chaining: ``hash = 42``; for each column in order, a NULL leaves the
  hash unchanged, a non-NULL value rehashes with the running hash as
  seed — exactly Spark's ``XxHash64Function.hash``;
- type mapping mirrors Spark's ``HashExpression``: byte/short/int/date
  hash as *ints* (4-byte path), long/timestamp as *longs* (8-byte
  path), float as ``floatToIntBits`` (−0.0 → 0.0), double as
  ``doubleToLongBits`` (−0.0 → 0.0), boolean as int 0/1, strings and
  binary as their UTF-8/raw bytes through the full streaming xxHash64.

Everything is uint64 modular arithmetic; NumPy's wrapping unsigned
ops vectorize the int/long paths over whole Arrow column buffers (one
pass per column, no per-row Python except for strings)."""

from __future__ import annotations

import numpy as np

# uint64 arithmetic here overflows BY DESIGN (mod-2^64 hashing); NumPy's
# wraparound is the behavior we want. Each decorated call gets a FRESH
# errstate context: sharing one np.errstate instance across NESTED
# decorated calls corrupts its saved oldstate on numpy 1.x (the inner
# __enter__ overwrites it), leaking over=ignore globally — caught in
# round-13 review, regression-gated in tests/test_round13_sink.py.
def _wrapping(fn):
    import functools

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)

    return inner

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


@_wrapping
def hash_long(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """xxHash64 of each 8-byte value with its per-row seed (vectorized;
    ``values`` any int dtype reinterpreted as uint64)."""
    v = values.astype(np.int64).view(np.uint64)
    h = seeds + _P5 + np.uint64(8)
    k1 = _rotl(v * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


@_wrapping
def hash_int(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """xxHash64 of each 4-byte value with its per-row seed (Spark hashes
    byte/short/int/date/float-bits through this path)."""
    v = values.astype(np.int32).view(np.uint32).astype(np.uint64)
    h = seeds + _P5 + np.uint64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


@_wrapping
def hash_bytes(data: bytes, seed: int) -> int:
    """Streaming xxHash64 over a byte string (scalar — the string-column
    path loops rows; int paths stay vectorized)."""
    u64 = np.uint64
    seed = u64(seed)
    n = len(data)
    i = 0
    if n >= 32:
        v1 = seed + _P1 + _P2
        v2 = seed + _P2
        v3 = seed
        v4 = seed - _P1
        while i <= n - 32:
            w = np.frombuffer(data, dtype="<u8", count=4, offset=i)
            v1 = _rotl(v1 + w[0] * _P2, 31) * _P1
            v2 = _rotl(v2 + w[1] * _P2, 31) * _P1
            v3 = _rotl(v3 + w[2] * _P2, 31) * _P1
            v4 = _rotl(v4 + w[3] * _P2, 31) * _P1
            i += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
    else:
        h = seed + _P5
    h = h + u64(n)
    while i <= n - 8:
        w = np.frombuffer(data, dtype="<u8", count=1, offset=i)[0]
        h = _rotl(h ^ (_rotl(w * _P2, 31) * _P1), 27) * _P1 + _P4
        i += 8
    if i <= n - 4:
        w = u64(np.frombuffer(data, dtype="<u4", count=1, offset=i)[0])
        h = _rotl(h ^ (w * _P1), 23) * _P2 + _P3
        i += 4
    while i < n:
        h = _rotl(h ^ (u64(data[i]) * _P5), 11) * _P1
        i += 1
    return int(_fmix(np.array([h], dtype=np.uint64))[0])


@_wrapping
def xxhash64_arrow(columns, n_rows: int, seed: int = 42) -> np.ndarray:
    """Spark's ``F.xxhash64(col1, col2, ...)`` over pyarrow arrays —
    returns signed int64 hashes. Each element of ``columns`` is a
    pyarrow ``Array``/``ChunkedArray`` (chunked arrays are combined).
    Supported Arrow types: signed integers, bool, float32/64, string,
    binary, date32, timestamp[us]."""
    import pyarrow as pa

    h = np.full(n_rows, seed, dtype=np.uint64)
    for col in columns:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = col.type
        valid = np.asarray(
            col.is_valid(), dtype=bool
        )  # NULL lanes keep the running hash
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            py = col.to_pylist()
            for j in range(n_rows):
                if not valid[j]:
                    continue
                b = py[j].encode("utf-8") if isinstance(py[j], str) else py[j]
                h[j] = hash_bytes(b, int(h[j]))
            continue
        if pa.types.is_boolean(t):
            vals = np.asarray(col.fill_null(False), dtype=np.int32)
            new = hash_int(vals, h)
        elif pa.types.is_integer(t) and t.bit_width <= 32:
            vals = np.asarray(col.fill_null(0))
            new = hash_int(vals, h)
        elif pa.types.is_integer(t):
            vals = np.asarray(col.fill_null(0))
            new = hash_long(vals, h)
        elif pa.types.is_date32(t):
            vals = np.asarray(col.cast(pa.int32()).fill_null(0))
            new = hash_int(vals, h)
        elif pa.types.is_timestamp(t):
            vals = np.asarray(col.cast(pa.int64()).fill_null(0))
            new = hash_long(vals, h)
        elif pa.types.is_float32(t):
            f = np.asarray(col.fill_null(0.0), dtype=np.float32)
            f = np.where(f == np.float32(0.0), np.float32(0.0), f)  # -0 -> +0
            new = hash_int(f.view(np.int32), h)
        elif pa.types.is_float64(t):
            f = np.asarray(col.fill_null(0.0), dtype=np.float64)
            f = np.where(f == 0.0, 0.0, f)  # -0 -> +0
            new = hash_long(f.view(np.int64), h)
        else:
            raise ValueError(
                f"xxhash64_arrow: unsupported bucket-key type {t} "
                "(supported: int/bool/float/string/binary/date32/"
                "timestamp — the same set a layout bucket key may use)"
            )
        h = np.where(valid, new, h)
    return h.view(np.int64)


@_wrapping
def bucket_ids(columns, n_rows: int, n_buckets: int) -> np.ndarray:
    """``pmod(xxhash64(keys...), n_buckets)`` — the layout bucket id,
    matching ``versioned._bucket_column`` exactly."""
    h = xxhash64_arrow(columns, n_rows)
    return np.mod(np.mod(h, n_buckets) + n_buckets, n_buckets).astype(np.int64)
