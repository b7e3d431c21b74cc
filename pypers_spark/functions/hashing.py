"""Deterministic cross-engine hashing.

All dedup/LSH operators hash through md5 → 60-bit int64 so a DuckDB
oracle can reproduce results bit-for-bit:

    Spark : cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(x), 1, 15))::bigint

Spark's native ``hash``/``xxhash64`` are NOT portable across engines and
are only used for internal salting where no oracle comparison happens.
All expressions here are JVM-side built-ins → whole-stage codegen; no
Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column) -> Column:
    """md5 hex digest of a string column."""
    return F.md5(col.cast("string"))


def md5_int64(col: Column) -> Column:
    """Deterministic 60-bit non-negative int64 hash of a string column."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def md5_int64_seeded(col: Column, seed: int) -> Column:
    """Seeded variant: one independent hash family per integer seed."""
    return md5_int64(F.concat(F.lit(f"s{seed}:"), col.cast("string")))


def duck_md5_int64(expr: str) -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_int64`."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT)"


def duck_md5_int64_seeded(expr: str, seed: int) -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_int64_seeded`."""
    return duck_md5_int64(f"'s{seed}:' || CAST({expr} AS VARCHAR)")


# --- affine hash family ------------------------------------------------------
#
# MinHash needs k independent hash functions per shingle. Computing k md5
# digests per shingle is the dominant cost of the whole LSH pipeline; the
# standard fix is ONE base md5 hash per shingle plus k affine transforms
# h_j = (a_j·h + b_j) mod p over a Mersenne prime — integer arithmetic that
# stays inside whole-stage codegen and is reproduced exactly by DuckDB.

MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def affine_coeffs(seed: int) -> tuple[int, int]:
    """Deterministic (a, b) pair for hash-family member ``seed`` (a != 0)."""
    a = (1103515245 * (seed + 1) + 12345) % MINHASH_P
    b = (214013 * (seed + 1) + 2531011) % MINHASH_P
    return (a or 1, b)


def affine_hash(h: Column, seed: int) -> Column:
    """j-th family hash of a non-negative int64 base hash ``h``.

    ``a·(h mod p)`` < 2^62 so the arithmetic never overflows int64 —
    identical in Spark and DuckDB.
    """
    a, b = affine_coeffs(seed)
    return (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def duck_affine_hash(expr: str, seed: int) -> str:
    """DuckDB SQL fragment equivalent to :func:`affine_hash`."""
    a, b = affine_coeffs(seed)
    return f"(({a} * (({expr}) % {MINHASH_P}) + {b}) % {MINHASH_P})"
