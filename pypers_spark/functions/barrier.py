"""Pre-sort materialization barrier (guide §2.4/§8.3).

A global ``orderBy`` plans as ``Exchange(rangepartitioning)`` whose
partition bounds come from a SAMPLING pass over the exchange's child —
and that sampling pass executes the child plan end to end before the
real pass executes it again.  When the child is an expensive chain
(joins, windows, generates, codec stages) with no exchange or cache
boundary of its own directly beneath the sort, the query pays the
chain twice (measured: dd_containment_idx 28.9 + 8.7 executor-cpu-s,
txt_winnowing 19.9 + 9.3 at sf0.1).  Inserting a hash exchange right
under the sort materializes the chain once; the sampler then reads
shuffle blocks.

The hash key is ``xxhash64(col)`` ON PURPOSE: a plain
``repartition(col)`` / ``repartition(n, col)`` is ELIDED by the
optimizer whenever the child already carries hash(col) partitioning
(a same-key groupBy/window upstream) — which silently re-introduces
the double execution; that is exactly how txt_winnowing's r11 batch-3
fix regressed.  The optimizer cannot prove hash(xxhash64(col))
equivalent to hash(col), so the exchange survives, and AQE still
coalesces it to match the (tiny) readout size because
REPARTITION_BY_COL pins no partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_barrier(df: DataFrame, col: str) -> DataFrame:
    """Materialize ``df`` into one surviving hash exchange keyed on
    ``xxhash64(col)`` so a following global sort samples shuffle blocks
    instead of re-executing the plan. Row content is untouched."""
    return df.repartition(F.xxhash64(col))
