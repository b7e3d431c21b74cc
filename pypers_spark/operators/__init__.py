"""Operator library: each module exposes

- plain functions ``(tables: dict[str, DataFrame]) -> DataFrame`` that
  compose lazily (usable directly or wrapped in pipeline Stages), and
- ``ORACLES: dict[str, str]`` — DuckDB SQL reproducing each query
  bit-for-bit for the driver's correctness gate.

``REGISTRY`` merges all modules' query functions; ``ORACLES`` likewise.
"""

from __future__ import annotations

from pypers_spark.operators import (
    analytics,
    curation,
    curation_extra,
    dedup,
    geo,
    graph,
    incremental,
    lakehouse,
    events,
    events_extra,
    relational,
    relational_extra,
    semistructured,
    similarity,
    sketches,
    streaming_batch,
    text,
    text_extra,
    tpch_extra,
    tpch_rest,
    training,
)

# Ordered riskiest-first: the driver's correctness gate samples the
# first ~50 registry keys in insertion order, so the newest / most
# intricate operator families (streaming drain, curation, similarity,
# LSH dedup, multimodal) lead and the battle-tested TPC-H shapes trail.
MODULES = (
    analytics,
    geo,
    incremental,
    lakehouse,
    sketches,
    training,
    streaming_batch,
    curation_extra,
    similarity,
    dedup,
    graph,
    curation,
    text,
    text_extra,
    events_extra,
    events,
    semistructured,
    tpch_rest,
    tpch_extra,
    relational_extra,
    relational,
)

REGISTRY = {}
ORACLES = {}
# Oracles whose SQL embeds a literal path (e.g. read_parquet(filename=
# true)) are registered as builders ``fn(sf_dir) -> sql`` here and
# resolved by ``__spark_entry__.oracle_sql()`` at call time.
DYNAMIC_ORACLES = {}
for _m in MODULES:
    REGISTRY.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
    DYNAMIC_ORACLES.update(getattr(_m, "DYNAMIC_ORACLES", {}))

# Newest gate-risky entries whose home module sits outside the driver's
# ~50-key sample window — hoisted to the front so their first driver run
# is value-checked, not just judge-checked.
_HOISTED = (
    # Driver-sample steering (r7 verdict item #6, refreshed per round):
    # the per-round driver value-checks the first ~50 registry keys in
    # insertion order. The round-11 list is exactly the 25-key
    # never-driver-sampled backlog from tools/suggest_sample.py after
    # the r10 sample — one driver draw closes it to zero, so every
    # registry key has a driver-side green row at least once.
    "ev_funnel",
    "ev_asof_join",
    "ev_sessionize",
    "ev_sliding_topk",
    "ev_tumbling_window",
    "ev_srm_check",
    "ev_anomaly_seasonal",
    "ev_cohort_retention",
    "ev_attribution_linear",
    "ev_funnel_windowed",
    "ev_asof_tolerance",
    "ev_session_window",
    "ev_rolling_wau",
    "ev_zscore_outliers",
    "txt_readability",
    "txt_quality_prune",
    "mm_resize_meta",
    "mm_audio_meta",
    "gr_k_core",
    "gr_triangle_count",
    "gr_degree_stats",
    "gr_pagerank_t03",
    "pipe_entity_resolution",
    "dd_source_overlap_kmv",
    "dd_threshold_curve",
)
REGISTRY = {k: REGISTRY[k] for k in _HOISTED} | {
    k: v for k, v in REGISTRY.items() if k not in _HOISTED
}
