"""Cross-engine deterministic hashing (SURVEY.md §2.11 determinism rules).

The driver's correctness gate hash-compares Spark output against DuckDB, so
any hash that feeds a declared query output must compute bit-identically in
BOTH engines. Spark's native ``hash``/``xxhash64`` and DuckDB's ``hash()``
are different algorithms — instead we derive integers from ``md5`` hex
digests, which both engines implement identically:

    Spark : conv(substring(md5(s), 1, 8), 16, 10) cast long
    DuckDB: ('0x' || substr(md5(s), 1, 8))::BIGINT

``h32`` (8 hex chars, 32-bit) keeps products with 31-bit multipliers inside
int64 — required because neither engine wraps on BIGINT overflow. ``h16``
(4 hex chars) leaves room for polynomial rolling hashes (base^7 * 2^16 * 8
< 2^63). These are library functions; nothing here touches the driver.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash universal-hash family: (a * h32 + b) mod P with P prime > 2^32.
# Fixed literals => reproducible signatures in Spark, DuckDB, and tests.
MINHASH_P = 4294967311
MINHASH_A = [
    1205620405, 733686333, 1853049557, 993631737, 1654301945, 462346315,
    2136047103, 976939483, 1797623627, 341963673, 1021204351, 1662924587,
    153270673, 1962900001, 564043577, 1246907023,
]
MINHASH_B = [
    892984659, 1523849953, 194029627, 1091203313, 2039873685, 657312493,
    75658829, 1447659251, 318972017, 1878299141, 504312635, 1130570339,
    1710034883, 87265849, 1329048217, 734512681,
]
assert len(MINHASH_A) == len(MINHASH_B) == 16


def h32(col: Column) -> Column:
    """String -> deterministic 32-bit non-negative int64 (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h16(col: Column) -> Column:
    """String -> deterministic 16-bit non-negative int64 (md5-derived)."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`h32` over ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h16_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`h16` over ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 4))::BIGINT)"


def minhash_perm(hcol: Column, k: int) -> Column:
    """k-th universal-hash permutation of a 32-bit hash value."""
    return (F.lit(MINHASH_A[k]) * hcol + F.lit(MINHASH_B[k])) % F.lit(MINHASH_P)


def minhash_perm_sql(hexpr: str, k: int) -> str:
    """DuckDB SQL equivalent of :func:`minhash_perm`."""
    return f"(({MINHASH_A[k]} * {hexpr} + {MINHASH_B[k]}) % {MINHASH_P})"


def h32_py(s: str) -> int:
    """Python-side twin of :func:`h32` (hashlib md5) — used to precompute
    literal constants (e.g. LSH plane components) that both engines then
    consume as plain integers."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def plane_components(j: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane j for hyperplane-LSH:
    zero-mean integer components h32('j:i') - 2^31. Precomputed so the
    physical plan carries literals, not 512 md5 calls."""
    return [h32_py(f"{j}:{i}") - 2**31 for i in range(dim)]
