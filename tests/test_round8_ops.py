"""Round-8 hardening + coverage wave: duplicate-dense phash pair
mining (r7 verdict item #1), the one-pass RFM percentile plan (item
#2), and the pipe_lakehouse write-path pipeline (item #5)."""

from __future__ import annotations

from pyspark.sql import functions as F


# --- mm_phash_pairs hardening -------------------------------------------------


def _dup_dense(tables):
    """A duplicate-dense corpus: every document appears twice (shifted
    id, identical text → identical derived image → identical dHash) —
    the real-corpus logo/byte-copy profile the r7 verdict flagged."""
    docs = tables["documents"]
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    t2 = dict(tables)
    t2["documents"] = doubled
    return t2


def test_phash_pairs_collapse_and_cap_semantics(spark, sf_dir, tables):
    """The hardened miner must (a) emit every within-group Hamming-0
    pair without running it through banding, and (b) emit cross-hash
    pairs only through cap-respecting band buckets. Checked against a
    brute-force recomputation from the persisted hash table, on a
    corpus where every hash is duplicated."""
    from itertools import combinations

    from pypers_spark.operators.text import (
        PHP_BANDS,
        PHP_HAM_T,
        PHP_MAX_BUCKET_WIDTH,
        _phash_table,
        mm_phash_pairs,
    )

    t2 = _dup_dense(tables)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm_phash_pairs(t2).collect()
    }
    ph = {r["media_id"]: r["phash"] for r in _phash_table(t2).collect()}

    # brute-force reference over the collapsed representative space
    reps = sorted(set(ph.values()))
    buckets: dict[tuple[int, str], list[str]] = {}
    for h in reps:
        for b in range(PHP_BANDS):
            buckets.setdefault((b, h[b * 4 : (b + 1) * 4]), []).append(h)
    cand = set()
    for hs in buckets.values():
        if 2 <= len(hs) <= PHP_MAX_BUCKET_WIDTH:
            cand.update(combinations(sorted(hs), 2))
    want = {}
    for a, b in combinations(sorted(ph), 2):
        ha, hb = ph[a], ph[b]
        if ha == hb:
            want[(a, b)] = 0
        elif (min(ha, hb), max(ha, hb)) in cand:
            d = bin(int(ha, 16) ^ int(hb, 16)).count("1")
            if d <= PHP_HAM_T:
                want[(a, b)] = d
    assert got == want
    assert any(h == 0 for h in got.values())  # fixture has exact dups
    assert any(h > 0 for h in got.values())  # ... and near-dups


def test_phash_candidate_stage_runs_on_distinct_hashes(spark, sf_dir, tables):
    """Scale property: duplicate-dense input must NOT widen the band
    buckets — k copies of one image contribute ONE representative to
    candidate generation. Pinned via the bucket-stats profile on a
    corpus where every hash is duplicated."""
    from pypers_spark.operators.text import _phash_table, mm_phash_bucket_stats

    t2 = _dup_dense(tables)
    stats = {r["band"]: r for r in mm_phash_bucket_stats(t2).collect()}
    ph = _phash_table(t2)
    ph_rows = ph.count()
    n_distinct = ph.select("phash").distinct().count()
    assert ph_rows > n_distinct  # fixture is duplicate-dense
    for band, row in stats.items():
        # bucket widths are counted over representatives: the per-band
        # total bucketed width can never exceed the distinct-hash count
        assert row["n_buckets"] <= n_distinct
        assert row["n_collapsed"] == ph_rows - n_distinct


# --- one-pass RFM percentiles -------------------------------------------------


def test_rfm_single_percentile_pass_plan(spark, sf_dir, tables):
    """The nine RFM cutoffs must come from ONE unpivoted percentile
    plan: exactly one groupBy(metric, value) aggregate — i.e. the
    executed plan contains the metric-key exchange once, not three
    separate percentile subtrees over per_user."""
    from pypers_spark.operators.events_extra import ev_rfm_segments

    df = ev_rfm_segments(tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the unpivot's explode feeds the single cuts plan
    assert plan.lower().count("generate explode") <= 1


# --- pipe_lakehouse -----------------------------------------------------------


def test_lakehouse_diff_join_is_exchange_free(spark, sf_dir, tables):
    """The snapshot-diff stage must read both bucketed versions with
    ZERO Exchange on either side of the full-outer join (the
    tests/test_bucketed.py contract, now inside the composed
    pipeline): after the pipeline lands the tables, the co-located
    diff join's plan has no shuffle above the two bucketed scans."""
    from pypers_spark.operators.lakehouse import (
        LH_BASE_TABLE,
        LH_SNAP_TABLE,
        pipe_lakehouse,
    )

    report = pipe_lakehouse(tables)
    row = report.collect()[0]
    # sanity on the report semantics
    assert row["diff_added"] > 0 and row["diff_removed"] > 0
    assert row["diff_changed"] > 0 and row["diff_unchanged"] > 0
    assert row["zm_files"] > 0 and row["cp_output_files"] <= row["cp_input_files"]

    lt, st = spark.table(LH_BASE_TABLE), spark.table(LH_SNAP_TABLE)
    joined = lt.join(st, lt["k"] == st["k"], "full_outer")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert "SortMergeJoin" in plan


def test_lakehouse_write_roundtrip_lossless(spark, sf_dir, tables):
    """The landed snapshot table must hold exactly the logical snapshot
    (row count and value checksum) — the property the oracle's
    derive-from-orders shortcut relies on."""
    from pypers_spark.operators.lakehouse import LH_SNAP_TABLE, pipe_lakehouse
    from pypers_spark.operators.incremental import DEL_MOD, INS_MOD

    pipe_lakehouse(tables)
    o = tables["orders"]
    n_expected = (
        o.filter(F.col("o_orderkey") % DEL_MOD != 0).count()
        + o.filter(F.col("o_orderkey") % INS_MOD == 0).count()
    )
    landed = spark.table(LH_SNAP_TABLE)
    assert landed.count() == n_expected
    assert landed.filter(F.col("price").isNull()).count() == 0
