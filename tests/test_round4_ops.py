"""Semantic property tests for round-4 operators — invariants the
value-oracle comparison can't express (cross-operator consistency,
structural properties of results)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_bigram_score_bounds_and_coverage(spark, sf_dir, qs, tables):
    """Scores are conditional-probability means → in (0, 1]; every doc
    with >= 2 tokens is scored."""
    rows = qs["txt_bigram_score"](spark, sf_dir).collect()
    assert rows
    assert all(0.0 < r["bigram_score"] <= 1.0 + 1e-9 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)
    from pypers_spark.functions.text import normalize_text

    n_docs = (
        tables["documents"]
        .filter(F.size(F.split(normalize_text(F.col("text")), " ")) >= 2)
        .count()
    )
    assert len(rows) == n_docs


def test_semantic_dedup_pairs_are_co_cell_and_thresholded(spark, sf_dir, qs):
    """Every emitted pair sits in ONE cell of the k-means assignment and
    clears the τ=0.3 cosine threshold; ids are canonically ordered."""
    rows = qs["dd_semantic_dedup"](spark, sf_dir).collect()
    assert rows  # τ=0.3 yields pairs on this corpus
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["cos_sim"] >= 0.3 for r in rows)
    # cells come from a sqrt(n) seeding — all cell ids under ceil(sqrt(n))
    import math

    from pypers_spark.sources import load_tables
    from pypers_spark.session import current_session

    n_vecs = load_tables(current_session(), sf_dir)["embeddings"].count()
    k = math.ceil(math.sqrt(n_vecs))
    assert all(0 <= r["cell"] < k for r in rows)


def test_semantic_dedup_blocks_only_reduce_label_blocked_pairs(spark, sf_dir, qs):
    """Cell blocking and label blocking are different partitions of the
    corpus, but both verify the SAME cosine — on pairs surfaced by
    both, the value must agree exactly."""
    by_cell = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in qs["dd_semantic_dedup"](spark, sf_dir).collect()
    }
    by_label = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in qs["dd_embedding_cos_t03"](spark, sf_dir).collect()
    }
    overlap = set(by_cell) & set(by_label)
    assert all(by_cell[k] == by_label[k] for k in overlap)


def test_stream_dedup_matches_batch_distinct(spark, sf_dir, qs, tables):
    """The drained streaming dedup equals batch DISTINCT on the keys."""
    streamed = qs["st_stream_dedup"](spark, sf_dir).count()
    batch = tables["events"].select("user_id", "event_type", "ts").distinct().count()
    assert streamed == batch


def test_session_counts_subset_of_native_session_window(spark, sf_dir, qs):
    """Gap-closed streaming sessions are a subset of the batch
    lag+cumsum sessionization (same user, same start, same count) —
    only each user's final open session is absent."""
    streamed = qs["st_session_counts"](spark, sf_dir)
    from pypers_spark.operators.events import ev_sessionize
    from pypers_spark.sources import load_tables
    from pypers_spark.session import current_session

    t = load_tables(current_session(), sf_dir)
    batch = ev_sessionize({"events": t["events"]})
    s = {(r["user_id"], r["session_start"], r["n_events"]) for r in streamed.collect()}
    b = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()}
    assert s  # non-vacuous
    assert s <= b
    # exactly one session per active user is missing (the open one)
    users_s = {u for u, _, _ in s}
    missing = [x for x in b - s if x[0] in users_s]
    from collections import Counter

    per_user = Counter(u for u, _, _ in missing)
    assert all(c == 1 for c in per_user.values())


def test_triangle_census_consistent_with_pair_graph(spark, sf_dir, qs):
    """Cross-operator consistency: gr_triangle_count's node/edge counts
    equal what dd_embedding_cos_t03's pair list implies, wedges equal
    the closed-form from gr_degree_stats' histogram, and the clustering
    coefficient is in [0, 1]."""
    census = qs["gr_triangle_count"](spark, sf_dir).collect()[0]
    pairs = qs["dd_embedding_cos_t03"](spark, sf_dir).collect()
    nodes = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert census["n_edges"] == len(pairs)
    assert census["n_nodes"] == len(nodes)
    hist = qs["gr_degree_stats"](spark, sf_dir).collect()
    assert sum(r["n_nodes"] for r in hist) == census["n_nodes"]
    wedges = sum(r["n_nodes"] * r["deg"] * (r["deg"] - 1) // 2 for r in hist)
    assert census["n_wedges"] == wedges
    assert 0.0 <= census["global_clustering"] <= 1.0


def test_pii_scrub_non_vacuous_and_clean(spark, sf_dir, qs):
    """Every row matched at least one of each planted PII kind, and the
    scrubbed text admits no further matches (idempotence of the pass)."""
    from pypers_spark.functions.text import PII_PATTERNS, scrub_pii, pii_count

    rows = qs["txt_pii_scrub"](spark, sf_dir).collect()
    assert rows
    assert all(
        r["n_email"] >= 1 and r["n_phone"] >= 1 and r["n_ipv4"] >= 1 for r in rows
    )
    # idempotence on a synthetic worst case: placeholders must not
    # re-match any pattern
    once = spark.sql(
        "SELECT 'a@b.co 555-123-4567 10.1.2.3' AS s"
    ).select(scrub_pii(F.col("s")).alias("s1"))
    twice = once.select(
        *[pii_count(F.col("s1"), k).alias(f"n_{k}") for k in PII_PATTERNS]
    ).collect()[0]
    assert twice["n_email"] == 0 and twice["n_phone"] == 0 and twice["n_ipv4"] == 0


def test_salted_join_matches_plain_join_rowcount(spark, sf_dir, tables):
    """salted_join is row-equivalent to the plain equi-join (salt never
    changes the match set) — checked on the raw joined relation, not the
    rolled-up gate output."""
    from pypers_spark.functions.skew import salted_join

    ev = tables["events"].select("user_id", "event_id")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    salted = salted_join(ev, dim, "user_id")
    plain = ev.join(dim, "user_id")
    assert salted.count() == plain.count()
    assert salted.columns == plain.columns


def test_sliding_counts_double_tumbling_mass(spark, sf_dir, qs, tables):
    """Every event lands in exactly two sliding windows → total event
    mass is exactly 2x the corpus."""
    rows = qs["st_sliding_counts"](spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == 2 * tables["events"].count()


def test_pq_seed_vectors_reconstruct_exactly(spark, sf_dir, qs):
    """Codebook centroids ARE the first 16 vectors — each must PQ-encode
    to itself with zero reconstruction error, and every packed code must
    fit in 16 bits."""
    rows = qs["ann_pq"](spark, sf_dir).collect()
    assert rows
    by_id = {r["vec_id"]: r for r in rows}
    for vid in range(min(16, len(rows))):
        if vid in by_id:
            assert by_id[vid]["recon_d2"] == 0.0
            # self-code: every subspace picks centroid vid → packed
            # code is vid * (1 + 16 + 256 + 4096)
            assert by_id[vid]["pq_code"] == vid * 0x1111
    assert all(0 <= r["pq_code"] <= 0xFFFF for r in rows)


def test_pq_adc_consistent_with_codes(spark, sf_dir, qs):
    """The query vector's own nearest ADC neighbors must all carry
    approx_d2 >= 0, ranked ascending, query excluded."""
    rows = qs["ann_pq_adc"](spark, sf_dir).collect()
    assert rows
    d2s = [r["approx_d2"] for r in rows]
    assert d2s == sorted(d2s)
    assert all(d >= 0.0 for d in d2s)
    assert all(r["vec_id"] != 0 for r in rows)


def test_file_stats_matches_duckdb(spark, sf_dir, tables):
    """op_file_stats (not registry-gated: its DuckDB twin needs a
    literal parquet path) value-matches DuckDB's
    read_parquet(filename=true) rollup per file."""
    import duckdb

    from pypers_spark.operators.relational_extra import (
        duck_file_stats_sql,
        op_file_stats,
    )

    got = {
        r["file_name"]: (r["n_rows"], r["min_key"], r["max_key"])
        for r in op_file_stats(tables).collect()
    }
    con = duckdb.connect()  # keep alive: a temporary would be GC'd mid-query
    want = {
        fn: (n, lo, hi)
        for fn, n, lo, hi in con.sql(duck_file_stats_sql(sf_dir)).fetchall()
    }
    con.close()
    assert got == want and got
