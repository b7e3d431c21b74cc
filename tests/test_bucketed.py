"""Bucketed-table co-located joins: the Exchange-free fact⋈fact path.

The 100 TB claim behind sources/bucketed.py is mechanical and therefore
asserted mechanically: writing both join sides bucketed on the join key
into the same bucket count makes the sort-merge join's children the
bucketed scans themselves — zero Exchange in the physical plan — while
the same join over plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest

from pypers_spark.sources.bucketed import (
    assert_colocated,
    bucket_spec,
    colocated_join,
    write_bucketed,
)
from pypers_spark.sources.registry import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        li, "li_bucketed", N_BUCKETS, ["l_orderkey"], path=str(base / "li")
    )
    write_bucketed(
        orders, "ord_bucketed", N_BUCKETS, ["o_orderkey"], path=str(base / "ord")
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucket_spec_roundtrip(spark, bucketed_tables):
    left, right = bucketed_tables
    assert bucket_spec(spark, left) == (N_BUCKETS, ("l_orderkey",))
    assert bucket_spec(spark, right) == (N_BUCKETS, ("o_orderkey",))
    assert_colocated(spark, left, right)  # must not raise


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    """The whole point: co-bucketed join plans with ZERO Exchange even
    with auto-broadcast disabled (the 100 TB regime where neither fact
    side is small)."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, "l_orderkey", "o_orderkey")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)


def test_unbucketed_same_join_shuffles(spark, sf_dir):
    """Control: the identical join over plain parquet scans exchanges
    both sides — what bucketing saves."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        plan = _executed_plan(joined)
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)


def test_colocated_join_values_match_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, "l_orderkey", "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    assert joined.count() == plain.count()


def test_assert_colocated_rejects_mismatch(spark, sf_dir, bucketed_tables, tmp_path):
    left, _ = bucketed_tables
    nation = load_table(spark, sf_dir, "nation")
    write_bucketed(
        nation, "nation_b4", 4, ["n_nationkey"], path=str(tmp_path / "n4")
    )
    try:
        with pytest.raises(ValueError, match="bucket layouts differ"):
            assert_colocated(spark, left, "nation_b4")
        with pytest.raises(ValueError, match="needs both sides bucketed"):
            assert_colocated(spark, left, "nonbucketed_view")
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_b4")


@pytest.fixture(autouse=True)
def _nonbucketed_view(spark, sf_dir):
    load_table(spark, sf_dir, "region").createOrReplaceTempView("nonbucketed_view")
    yield
    spark.catalog.dropTempView("nonbucketed_view")
