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
    addition in any order, ~5x faster than Spark's BigDecimal sum
    path, same magnitude envelope as DECIMAL(18,6) (12 integral
    digits before overflow).
    """
    return (F.sum(F.floor(col * 1e6 + F.lit(0.5))) / F.lit(1e6)).cast("double")


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
