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
