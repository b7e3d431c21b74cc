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
    # insertion order. The round-10 list is exactly the
    # never-driver-sampled backlog from tools/suggest_sample.py after
    # the r9 sample (75 keys), newest registrations first, with the
    # round-10-new mm_png_meta leading — so the r10 driver run closes
    # the gap to ≤25 and every key is driver-sampled at least once by
    # r11.
    "mm_png_meta",
    "op_zorder",
    "op_skew_report",
    "op_salted_join",
    "ev_markov_stationary",
    "ev_seasonal_baseline",
    "ev_feature_matrix",
    "ev_delta_rollup",
    "ev_ab_lift",
    "ev_cumulative_users",
    "ev_top_paths",
    "ev_ewma",
    "txt_pii_scrub",
    "mm_chunk_bytes",
    "gr_modularity",
    "dd_containment_idx",
    "dd_containment",
    "dd_bloom_admit",
    "dd_lsh_curve",
    "ann_knn_graph",
    "ann_pq_refine",
    "ann_pq",
    "ann_ivf_nprobe",
    "dd_semantic_dedup",
    "dd_cluster_t03",
    "dd_embedding_cos_t03",
    "op_pps_sample",
    "ann_kmeans_update",
    "dd_span_scrub",
    "txt_ngram_novelty",
    "txt_bigram_score",
    "st_upsert_drain",
    "st_sliding_counts",
    "st_interval_join",
    "st_stream_dedup",
    "st_session_counts",
    "dd_chunk_cdc",
    "pipe_training",
    "txt_split_holdout",
    "txt_mix_apply",
    "txt_clf_score",
    "txt_chunk",
    "sk_moments",
    "op_scd2_lookup",
    "ann_pq_adc",
    "ann_ivf_pq",
    "ann_knn_graph_cells",
    "ann_graph_search",
    "dd_minhash_drop_list",
    "dd_minhash_apply",
    "dd_threshold_curve",
    "dd_source_overlap_kmv",
    "pipe_entity_resolution",
    "gr_pagerank_t03",
    "gr_degree_stats",
    "gr_triangle_count",
    "gr_k_core",
    "mm_audio_meta",
    "mm_resize_meta",
    "txt_quality_prune",
    "txt_readability",
    "ev_zscore_outliers",
    "ev_rolling_wau",
    "ev_session_window",
    "ev_asof_tolerance",
    "ev_funnel_windowed",
    "ev_attribution_linear",
    "ev_cohort_retention",
    "ev_anomaly_seasonal",
    "ev_srm_check",
    "ev_tumbling_window",
    "ev_sliding_topk",
    "ev_sessionize",
    "ev_asof_join",
    "ev_funnel",
)
REGISTRY = {k: REGISTRY[k] for k in _HOISTED} | {
    k: v for k, v in REGISTRY.items() if k not in _HOISTED
}
