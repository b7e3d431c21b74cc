"""Semantic property tests for the round-4 late-wave operators —
structural invariants the value-oracle comparison can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_pq_refine_beats_or_matches_adc(spark, sf_dir, qs):
    """The reranked top-10 must order by EXACT cosine and recall at
    least as much of the brute-force top-10 as bare ADC does."""
    exact = [r["vec_id"] for r in qs["ann_topk_cosine"](spark, sf_dir).collect()]
    adc = [r["vec_id"] for r in qs["ann_pq_adc"](spark, sf_dir).collect()]
    refined = qs["ann_pq_refine"](spark, sf_dir).collect()
    ref_ids = [r["vec_id"] for r in refined]
    assert len(ref_ids) == len(set(ref_ids)) == 10
    sims = [r["cos_sim"] for r in refined]
    assert sims == sorted(sims, reverse=True)
    assert len(set(ref_ids) & set(exact)) >= len(set(adc) & set(exact))


def test_txt_chunk_covers_every_token(spark, sf_dir, qs, tables):
    """Chunks tile each document: ragged last chunk, stride-1 overlap
    accounting, and total coverage equals the doc's token count."""
    from pypers_spark.functions.text import tokenize_ws
    from pypers_spark.operators.training import CHUNK_SIZE, CHUNK_STRIDE

    chunks = qs["txt_chunk"](spark, sf_dir).collect()
    per_doc: dict = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    n_toks = {
        r["doc_id"]: r["n"]
        for r in tables["documents"]
        .select("doc_id", F.size(tokenize_ws(F.col("text"))).alias("n"))
        .collect()
    }
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = n_toks[doc_id]
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        for i, r in enumerate(rows[:-1]):
            assert r["n_chunk_tokens"] == CHUNK_SIZE, (doc_id, i)
        # the last chunk ends exactly at the document's last token —
        # full tiling, no token dropped, no phantom chunk
        assert (len(rows) - 1) * CHUNK_STRIDE + rows[-1]["n_chunk_tokens"] == n


def test_txt_mix_apply_share_sums_to_one(spark, sf_dir, qs):
    rows = qs["txt_mix_apply"](spark, sf_dir).collect()
    assert rows
    total = sum(r["achieved_share"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    for r in rows:
        # epochs-plus-fraction: copies within [floor(w)*n, ceil(w)*n]
        lo = math.floor(r["weight"]) * r["n_docs"]
        hi = math.ceil(r["weight"]) * r["n_docs"]
        assert lo <= r["n_doc_copies"] <= hi


def test_zorder_buckets_bound_both_dims(spark, sf_dir, qs):
    """The point of the Morton layout: every file bucket's x AND y spans
    are bounded by the low-nibble width (15), not the full 0..255."""
    rows = qs["op_zorder"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["x_max"] - r["x_min"] <= 15
        assert r["y_max"] - r["y_min"] <= 15


def test_lsh_curve_knees(spark, sf_dir, qs):
    """S-curve sanity: p is monotone in s for fixed config; more rows
    per band pushes the knee right (more selective)."""
    rows = qs["dd_lsh_curve"](spark, sf_dir).collect()
    by_cfg: dict = {}
    for r in rows:
        by_cfg.setdefault((r["bands"], r["rows_per_band"]), []).append(r)
    assert set(by_cfg) == {(16, 1), (8, 2), (4, 4), (2, 8)}
    for cfg, rs in by_cfg.items():
        rs.sort(key=lambda r: r["s"])
        ps = [r["p_candidate"] for r in rs]
        assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:])), cfg
    # half-collision point moves right as r grows
    def knee(cfg):
        rs = sorted(by_cfg[cfg], key=lambda r: r["s"])
        return next(r["s"] for r in rs if r["p_candidate"] >= 0.5)

    assert knee((16, 1)) < knee((8, 2)) < knee((4, 4)) < knee((2, 8))


def test_bloom_admit_accounting(spark, sf_dir, qs):
    """Bloom filters never false-negative: every true duplicate passes;
    pass + avoided = batch; false positives are the (sized) remainder."""
    r = qs["dd_bloom_admit"](spark, sf_dir).collect()[0]
    assert r["n_batch"] == r["n_bloom_pass"] + r["n_exact_checks_avoided"]
    assert r["n_bloom_pass"] == r["n_true_dup"] + r["n_false_pos"]
    # half the synthetic batch collides with the base by construction
    assert r["n_true_dup"] == r["n_batch"] // 2
    assert r["n_false_pos"] < r["n_batch"] // 10  # 4096 bits keeps fp low here


def test_ab_lift_assignment_is_stable_and_balanced(spark, sf_dir, qs, tables):
    rows = qs["ev_ab_lift"](spark, sf_dir).collect()
    assert rows
    n_events = tables["events"].count()
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_events
    for r in rows:
        # hash split is roughly balanced per type
        assert 0.2 < r["n_a"] / (r["n_a"] + r["n_b"]) < 0.8
        if r["t_stat"] is not None:
            assert abs(r["t_stat"]) < 50


def test_delta_rollup_merge_equals_direct(spark, sf_dir, qs, tables):
    """The merged partial-aggregate rollup equals a direct single-pass
    aggregation (count per (day, type)) — mergeability, engine-side."""
    merged = {
        (r["day"], r["event_type"]): r["n"]
        for r in qs["ev_delta_rollup"](spark, sf_dir).collect()
    }
    direct = {
        (r["day"], r["event_type"]): r["n"]
        for r in tables["events"]
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert merged == direct


def test_containment_dominates_jaccard(spark, sf_dir, qs):
    """J = |∩|/|∪| ≤ |∩|/|A| = containment, both directions; and the op
    must surface at least one asymmetric pair Jaccard would miss."""
    rows = qs["dd_containment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["jaccard"] <= min(r["cont_a_in_b"], r["cont_b_in_a"]) + 1e-9
        assert max(r["cont_a_in_b"], r["cont_b_in_a"]) >= 0.8 - 1e-9
    assert any(r["jaccard"] < 0.8 for r in rows)


def test_knn_graph_shape(spark, sf_dir, qs):
    rows = qs["ann_knn_graph"](spark, sf_dir).collect()
    per_vec: dict = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], []).append(r)
    assert per_vec
    for vec_id, rs in per_vec.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert vec_id not in {r["nbr_id"] for r in rs}


def test_feature_matrix_no_leakage(spark, sf_dir, qs, tables):
    """One row per purchase; prior counts can never exceed the total
    strictly-before event count (the leakage invariant)."""
    rows = qs["ev_feature_matrix"](spark, sf_dir).collect()
    n_purchases = tables["events"].filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases
    for r in rows:
        typed = sum(r[f"n_{ty}_before"] for ty in ("view", "click", "signup", "error"))
        assert typed <= r["n_events_before"]  # remainder = prior purchases
        assert r["secs_active"] >= 0
        assert r["prior_spend"] >= 0


def test_split_holdout_partitions_corpus(spark, sf_dir, qs, tables):
    rows = qs["txt_split_holdout"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == tables["documents"].count()
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    assert 0.8 < train / total < 0.97


def test_span_scrub_consistent_with_spans(spark, sf_dir, qs, tables):
    """Every doc appears once; docs named by dd_dup_spans lose at least
    a span's worth of tokens, untouched docs keep their exact text."""
    scrub = {r["doc_id"]: r for r in qs["dd_span_scrub"](spark, sf_dir).collect()}
    assert len(scrub) == tables["documents"].count()
    # token-coverage UNION per doc: two islands of duplicated gram
    # positions separated by a sub-N gap overlap in token coverage, so
    # summing widths would double-count
    spans: dict = {}
    for r in qs["dd_dup_spans"](spark, sf_dir).collect():
        spans.setdefault(r["doc_id"], set()).update(
            range(r["start_tok"], r["end_tok"] + 1)
        )
    spans = {k: len(v) for k, v in spans.items()}
    from pypers_spark.functions.text import tokenize_ws

    originals = {
        r["doc_id"]: r["m"]
        for r in tables["documents"]
        .select(
            "doc_id", F.md5(F.concat_ws(" ", tokenize_ws(F.col("text")))).alias("m")
        )
        .collect()
    }
    for doc_id, r in scrub.items():
        assert 0 <= r["n_tok_removed"] <= r["n_tok"]
        if doc_id in spans:
            assert r["n_tok_removed"] == spans[doc_id]
        else:
            assert r["n_tok_removed"] == 0
            assert r["scrubbed_md5"] == originals[doc_id]


def test_pipe_training_is_one_catalyst_plan(spark, sf_dir, qs):
    """The five training stages compose into one Catalyst plan over the
    single documents source — pruned scans, no Python row UDFs, and the
    split filter evaluated at/near the scan (pushdown through stages)."""
    df = qs["pipe_training"](spark, sf_dir)
    explained = df._jdf.queryExecution().toString()
    n_scans = explained.count("FileScan")
    assert 1 <= n_scans <= 3
    assert explained.count("documents.parquet") >= n_scans
    read_schemas = [seg.split(">")[0] for seg in explained.split("ReadSchema: ")[1:]]
    assert read_schemas and all("n_chars" not in rs for rs in read_schemas)
    assert "BatchEvalPython" not in explained


def test_containment_idx_finds_exact_copies(spark, sf_dir, qs, tables):
    """The perturbed corpus copy has an identical normalized trigram set
    per doc, so every (d, d+1e6) pair must surface with cont_max = 1.0;
    all emitted pairs clear τ."""
    rows = qs["dd_containment_idx"](spark, sf_dir).collect()
    assert rows
    exact = {(r["id_a"], r["id_b"]) for r in rows if r["cont_max"] >= 0.9999}
    n_docs_3tok = (
        tables["documents"].filter(F.size(F.split(F.col("text"), " ")) >= 3).count()
    )
    assert len(exact) >= n_docs_3tok  # at least every base↔copy pair
    for r in rows:
        assert r["cont_max"] >= 0.5
        assert r["inter"] <= min(r["ng_a"], r["ng_b"])


def test_markov_stationary_is_a_distribution(spark, sf_dir, qs):
    rows = qs["ev_markov_stationary"](spark, sf_dir).collect()
    assert rows
    total = sum(r["stationary_mass"] for r in rows)
    assert abs(total - 1.0) < 1e-6  # power iteration preserves mass
    for r in rows:
        assert 0.0 < r["stationary_mass"] < 1.0


def test_rake_phrases_are_stopword_free(spark, sf_dir, qs):
    from pypers_spark.functions.text import STOPWORDS_EN

    rows = qs["txt_rake"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["rake_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r["phrase"].split(" ")
        assert len(words) == r["n_words"]
        assert not set(words) & set(STOPWORDS_EN)
        assert r["rake_score"] > 0


def test_soft_weights_effective_mass(spark, sf_dir, qs):
    """Effective docs ≤ total docs; equality only when nothing grouped;
    and the hard-drop survivor count from dd_minhash_apply must be ≤
    the soft effective mass (soft keeps fractional credit hard drops)."""
    rows = qs["dd_soft_weights"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["effective_docs"] <= r["n_docs"] + 1e-9
        if r["n_grouped"] == 0:
            assert abs(r["effective_docs"] - r["n_docs"]) < 1e-9
        else:
            assert r["effective_docs"] < r["n_docs"]


def test_seasonal_flags_exceed_their_baseline(spark, sf_dir, qs):
    rows = qs["ev_seasonal_baseline"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] > r["mean_n"] + 2.0 * r["sd_n"] - 1e-6


def test_funnel_24h_superset_of_1h(spark, sf_dir, qs):
    """Widening the window can only admit more conversions."""
    u1 = {r["user_id"] for r in qs["ev_funnel_windowed"](spark, sf_dir).collect()}
    u24 = {r["user_id"] for r in qs["ev_funnel_windowed_24h"](spark, sf_dir).collect()}
    assert u1 <= u24
    assert u24  # non-vacuous at the gate SF


def test_forecast_residual_reconstruction(spark, sf_dir, qs, tables):
    """slope/intercept must reproduce the daily series' least-squares
    fit: recompute the normal equations in python and compare."""
    rows = qs["ev_forecast_linear"](spark, sf_dir).collect()
    assert rows
    daily = (
        tables["events"]
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("y"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["y"]))
    for r in rows:
        pts = sorted(series[r["event_type"]])
        d0 = pts[0][0]
        xs = [(d - d0).days for d, _ in pts]
        ys = [y for _, y in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(r["slope_per_day"] - slope) < 1e-4


def test_forget_user_conservation(spark, sf_dir, qs, tables):
    rows = qs["op_forget_user"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_before"] == r["n_purged"] + r["n_after"]
        assert r["n_purged"] > 0  # the keyset is non-empty on this data
    total_purged = sum(r["n_purged"] for r in rows)
    expect = tables["events"].filter(F.col("user_id") % 10 == 7).count()
    assert total_purged == expect


def test_minhash_incremental_decisions(spark, sf_dir, qs):
    """Suffix variants of long docs must be caught (matched to their own
    base doc), word-reversed docs must admit; matches map to doc_id−1e6."""
    rows = qs["dd_minhash_incremental"](spark, sf_dir).collect()
    caught = [r for r in rows if r["admitted"] == 0]
    admitted = [r for r in rows if r["admitted"] == 1]
    assert caught and admitted
    for r in caught:
        assert r["best_jaccard"] >= 0.8
        # matched_base is the SMALLEST matching base doc — usually the
        # batch doc's own base, but corpus-internal near-dup groups can
        # surface an even smaller sibling (observed: 1000012 → 8)
        assert r["matched_base"] < 1000000
        assert r["doc_id"] % 2 == 0  # only suffix variants can match
    for r in admitted:
        assert r["matched_base"] is None
