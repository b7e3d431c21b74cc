"""Round-5 hardening tests: pointer-doubling connected components."""

from __future__ import annotations

from pyspark.sql import functions as F


def _components(spark, undirected_pairs):
    """Run min_label_components over explicit (a, b) pairs."""
    from pypers_spark.functions import components as C

    pairs = spark.createDataFrame(undirected_pairs, "src long, dst long")
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    out = C.min_label_components(edges, labels, "tests.cc_labels")
    return {r["node"]: r["lbl"] for r in out.collect()}, C.last_rounds


def test_chain_50_converges_logarithmically(spark):
    # A 50-node path 0-1-2-...-49: diameter 49. Plain one-hop min-label
    # propagation needs ~49 rounds (the round-4 implementation raised
    # RuntimeError at its 20-round cap on exactly this shape); pointer
    # jumping contracts it to O(log d) — 5 propagation rounds plus the
    # fixed-point detection round.
    got, rounds = _components(spark, [(i, i + 1) for i in range(49)])
    assert got == {i: 0 for i in range(50)}
    assert rounds <= 6, f"expected <= 6 rounds for a 50-chain, took {rounds}"


def test_chain_200_still_single_digit_rounds(spark):
    # 4x the diameter costs ~2 extra doubling rounds, not 4x the rounds.
    got, rounds = _components(spark, [(i, i + 1) for i in range(199)])
    assert got == {i: 0 for i in range(200)}
    assert rounds <= 8, f"expected <= 8 rounds for a 200-chain, took {rounds}"


def test_multiple_components_and_isolated_nodes(spark):
    # Two components with non-adjacent min ids plus a self-contained
    # star; labels must be each component's min and never leak across.
    pairs = [
        (10, 11), (11, 12),          # path {10,11,12}
        (3, 7), (7, 5),              # path {3,5,7} with min in the middle
        (20, 21), (20, 22), (20, 23) # star {20..23}
    ]
    got, _ = _components(spark, pairs)
    assert got == {
        10: 10, 11: 10, 12: 10,
        3: 3, 7: 3, 5: 3,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_drop_list_unchanged_by_rewrite(spark, duck, sf_dir):
    # The rewrite must not move the gate: the drop list still matches
    # its recursive-CTE oracle value-for-value.
    from tests.oracle_check import check_query

    assert check_query(spark, duck, "dd_minhash_drop_list", sf_dir) == []
