"""Deterministic cross-engine float discipline.

Two sources of Spark-vs-oracle float divergence:

1. **Aggregation order.** Double sums are order-dependent; Spark's
   partial aggregation order differs from any single-node engine. Fix:
   aggregate in DECIMAL (exact, order-independent), cast the exact
   result back to double.
2. **round() tie-breaking.** Spark rounds HALF_UP on the shortest
   decimal repr; DuckDB rounds on the scaled double — they disagree on
   boundary values (observed: 0.38835 → 0.3884 vs 0.3883). Fix: never
   call either engine's round; use ``floor(x * 10^d + 0.5) / 10^d``
   with plain double ops. Given identical input doubles, both engines
   execute identical IEEE operations → identical outputs, boundaries
   included.

Every query output column therefore goes through ``rnd``/``duck_rnd``,
and every float aggregate through ``dsum``/``duck_dsum`` (or an exact
integer sum).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(18,6)"


def rnd(col: Column, d: int = 2) -> Column:
    """Deterministic round-half-up via floor — identical in DuckDB."""
    scale = 10**d
    return (F.floor(col * scale + F.lit(0.5)) / F.lit(float(scale))).alias(f"rnd{d}")


def duck_rnd(expr: str, d: int = 2) -> str:
    scale = 10**d
    return f"(floor(({expr}) * {scale} + 0.5) / {scale}.0)"


def dsum(col: Column) -> Column:
    """Order-independent exact sum of a float expression → double.

    Terms are quantized to 1e-6 (round-half-up via floor — identical
    IEEE ops in both engines) and summed as int64: exact integer
    addition in any order, ~5x faster than Spark's BigDecimal sum path.

    ENVELOPE: the int64 accumulator holds the TOTAL, so the cap is
    ~9.2e12 in value units (9.2e18 / 1e6) per GROUP — and Spark's
    non-ANSI long sum silently WRAPS past it while DuckDB's BIGINT sum
    promotes to HUGEINT, so an overflow diverges the engines instead of
    erroring. Use the fast path only for bounded-cardinality groups
    (per-key aggregates whose group size doesn't grow with corpus
    size); whole-table / scalar totals must go through ``dsum_wide``.
    """
    return (F.sum(F.floor(col * 1e6 + F.lit(0.5))) / F.lit(1e6)).cast("double")


def dsum_wide(col: Column) -> Column:
    """``dsum`` for UNBOUNDED-cardinality sums (whole-table totals).

    Same 1e-6 quantization, but the integer terms accumulate in
    decimal(27,0) — Spark widens the sum to decimal(37,0), exact to
    ~1e31 value units, and an overflow yields null (detectable) rather
    than a silent wrap. Produces bit-identical doubles to ``dsum``
    whenever the latter doesn't overflow, so the same ``duck_dsum``
    oracle serves both (DuckDB's BIGINT sum already promotes to
    HUGEINT).
    """
    return (
        F.sum(F.floor(col * 1e6 + F.lit(0.5)).cast("decimal(27,0)")).cast("double")
        / F.lit(1e6)
    )


def duck_dsum(expr: str) -> str:
    return (
        f"(CAST(sum(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0)"
    )


def davg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum / exact count → double."""
    return dsum(col) / F.count(F.lit(1))


def duck_davg(expr: str) -> str:
    return f"({duck_dsum(expr)} / count(*))"
