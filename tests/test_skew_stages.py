"""Tests for skew helpers (functions/skew.py) and the operator↔Stage
bridge (operators/stages.py), plus property tests for spec parsing."""

from __future__ import annotations

import pytest
import yaml
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pypers_spark.config import Config
from pypers_spark.functions.skew import min_merge, salted, salted_agg, salted_join
from pypers_spark.task import decode_input_ids


# -- skew helpers -------------------------------------------------------------


def test_salted_adds_bounded_salt(spark, tables):
    df = salted(tables["lineitem"], n_salts=8)
    stats = df.agg(F.min("_salt"), F.max("_salt"), F.countDistinct("_salt")).collect()[0]
    assert stats[0] >= 0 and stats[1] < 8 and stats[2] > 1


def test_salted_agg_matches_plain_agg(spark, tables):
    li = tables["lineitem"]
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n"))
        .orderBy("l_returnflag")
        .collect()
    )
    via_salt = (
        salted_agg(
            li,
            ["l_returnflag"],
            [F.sum("l_quantity").alias("qty"), F.count("*").alias("n")],
            n_salts=8,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [(r.l_returnflag, r.qty, r.n) for r in plain] == [
        (r.l_returnflag, r.qty, r.n) for r in via_salt
    ]


def test_salted_agg_min_merge(spark, tables):
    li = tables["lineitem"]
    plain = li.groupBy("l_returnflag").agg(F.min("l_quantity").alias("lo"))
    via_salt = salted_agg(
        li, ["l_returnflag"], [F.min("l_quantity").alias("lo")],
        n_salts=4, merge_aggs=min_merge(["lo"]),
    )
    a = {(r.l_returnflag, r.lo) for r in plain.collect()}
    b = {(r.l_returnflag, r.lo) for r in via_salt.collect()}
    assert a == b


def test_salted_join_matches_plain_join(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    ords = tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(ords, "l_orderkey").count()
    via_salt = salted_join(li, ords, "l_orderkey", n_salts=4).count()
    assert plain == via_salt


def test_salted_join_spreads_shuffle_key(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    ords = tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plan = (
        salted_join(li, ords, "l_orderkey", n_salts=4)
        ._jdf.queryExecution().toString()
    )
    assert "_salt" in plan  # the join key includes the salt


def test_aqe_splits_skewed_fact_fact_join(spark, tables):
    """The 100 TB story leans on AQE for runtime skew in fact-fact
    joins: with a deliberately skewed key (every lineitem row mapped to
    one hot join key) and thresholds forced low, the executed plan must
    carry skew-join handling (``isSkew``/``skew=true`` markers on the
    sort-merge join) — the runtime counterpart of the pre-planned
    ``salted_join`` fallback tested above."""
    from pyspark.sql import functions as F

    # ~90% of rows land on key 0 — data skew Catalyst cannot fold away.
    skew_key = lambda n: (  # noqa: E731
        F.col("id") % F.lit(n) * F.when(F.col("id") % 100 < 90, 0).otherwise(1)
    ).alias("k")
    a = spark.range(0, 200_000).select(skew_key(10_000), F.col("id").alias("va"))
    b = spark.range(0, 20_000).select(skew_key(1_000), F.col("id").alias("vb"))
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        # coalescing first would merge the small partitions INTO the
        # measurement; disable it so the skew detector sees raw sizes
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # Global aggregate on top: no required output distribution, so
        # OptimizeSkewedJoin is free to split the skewed partitions.
        agg = a.join(b, "k").agg(F.count(F.lit(1)).alias("n"))
        [row] = agg.collect()
        assert row["n"] > 0
        plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert "skew=true" in plan or "skewed" in plan, plan[:2000]


# -- LSH skew guard -----------------------------------------------------------


def test_lsh_bucket_cap_drops_wide_buckets(spark, tables, monkeypatch):
    """With the cap forced below real bucket widths, every pair-producing
    bucket is dropped (skew guard engages) and the stats query reports
    the drops."""
    from pypers_spark.operators import dedup

    assert dedup.dd_minhash_lsh(tables).count() > 0  # perturbed dups pair up
    monkeypatch.setattr(dedup, "LSH_MAX_BUCKET_WIDTH", 1)
    assert dedup.dd_minhash_lsh(tables).count() == 0
    stats = dedup.dd_lsh_bucket_stats(tables).collect()
    assert len(stats) == dedup.N_BANDS
    for r in stats:
        assert r.n_dropped_buckets > 0
        # every dropped bucket had width >= 2 under cap=1
        assert r.n_dropped_rows >= 2 * r.n_dropped_buckets


def test_lsh_verify_join_shuffles_without_broadcast_hint(spark, tables):
    """The 100 TB regime: with auto-broadcast off, the Jaccard verify
    joins must fall back to shuffle joins keyed on doc id — no
    unconditional broadcast(cand) that could OOM on a hot band key.
    (With broadcast on, AQE may still pick a runtime broadcast from
    actual sizes — that path needs no hint.)"""
    from pypers_spark.operators import dedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup.dd_minhash_lsh(tables)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_ngram_lsh_matches_source_blocked_on_overlap(spark, tables):
    """Where the two blocking schemes both surface a pair, the Jaccard
    values must agree (same gram sets, same verify math)."""
    from pypers_spark.operators import dedup

    by_src = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.dd_ngram_jaccard(tables).collect()
    }
    by_lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.dd_ngram_jaccard_lsh(tables).collect()
    }
    overlap = set(by_src) & set(by_lsh)
    assert overlap  # the perturbed dups appear under both schemes
    assert all(by_src[k] == by_lsh[k] for k in overlap)


# -- operator ↔ stage bridge --------------------------------------------------


def test_query_stage_in_task(tmp_path, sf_dir, spark):
    (tmp_path / "q").mkdir(parents=True)
    (tmp_path / "q" / "task.yml").write_text(
        yaml.safe_dump(
            {
                "runnable": True,
                "input_ids": [1],
                "pipeline": [
                    "pypers_spark.operators.stages.LoadTablesStage",
                    "pypers_spark.operators.stages.QueryStage",
                ],
                "marginal_stages": ["load-tables"],
                "config": {
                    "load-tables": {"sf_dir": sf_dir},
                    "query": {"name": "q1_pricing_summary"},
                },
            }
        )
    )
    from pypers_spark.batch import Batch

    batch = Batch()
    batch.load(tmp_path / "q")
    rc = batch.context(tmp_path / "q")
    data = rc.run()
    assert (tmp_path / "q" / "data" / "1" / "result.parquet").is_dir()
    stored = spark.read.parquet(str(tmp_path / "q" / "data" / "1" / "result.parquet"))
    assert stored.count() == data[1]["result"].count() > 0
    assert "sum_qty" in stored.columns


# -- property tests -----------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
        st.one_of(st.integers(), st.text(max_size=5)),
        max_size=5,
    )
)
def test_config_roundtrip_flat(d):
    c = Config()
    for k, v in d.items():
        c[k] = v
    for k, v in d.items():
        assert c[k] == v
    assert Config(dict(d)) == Config(dict(d))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=999), max_size=20))
def test_decode_input_ids_list_idempotent(ids):
    out = decode_input_ids(ids)
    assert out == sorted(set(ids))
    assert decode_input_ids(out) == out


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=99), st.integers(min_value=0, max_value=99)
        ),
        min_size=1,
        max_size=5,
    )
)
def test_decode_input_ids_ranges(pairs):
    spec = ",".join(f"{min(a, b)}-{max(a, b)}" if a != b else str(a) for a, b in pairs)
    expected = sorted(
        {i for a, b in pairs for i in range(min(a, b), max(a, b) + 1)}
    )
    assert decode_input_ids(spec) == expected
