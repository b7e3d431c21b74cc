"""Operator library: each module exposes

- plain functions ``(tables: dict[str, DataFrame]) -> DataFrame`` that
  compose lazily (usable directly or wrapped in pipeline Stages), and
- ``ORACLES: dict[str, str]`` — DuckDB SQL reproducing each query
  bit-for-bit for the driver's correctness gate.

``REGISTRY`` merges all modules' query functions; ``ORACLES`` likewise.
"""

from __future__ import annotations

from pypers_spark.operators import (
    curation,
    curation_extra,
    dedup,
    graph,
    events,
    events_extra,
    relational,
    relational_extra,
    semistructured,
    similarity,
    streaming_batch,
    text,
    text_extra,
    tpch_extra,
    tpch_rest,
)

MODULES = (
    relational,
    relational_extra,
    tpch_extra,
    tpch_rest,
    semistructured,
    events,
    events_extra,
    dedup,
    similarity,
    text,
    text_extra,
    curation,
    curation_extra,
    graph,
    streaming_batch,
)

REGISTRY = {}
ORACLES = {}
for _m in MODULES:
    REGISTRY.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
