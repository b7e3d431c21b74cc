"""Connected components via min-label propagation with pointer jumping.

The dedup drop list (dedup.py) and the embedding near-dup clusters
(similarity.py) both need the transitive closure of a pair graph:
every node labeled with the MIN id of its connected component. Plain
min-label propagation advances one hop per round — O(component
diameter) rounds — which is a scale hazard: web-scale near-dup graphs
contain long boilerplate-drift chains (A~B~C~…), and a
diameter-bound loop either runs unboundedly or fails on them.

This helper interleaves each one-hop propagation with a POINTER JUMP
(``lbl ← lbl(lbl)``, the shortcutting step of classic pointer-doubling
/ Hash-to-Min connected components — Rastogi et al. 2012, Kiveris et
al. 2014 "Connected Components in MapReduce and Beyond"): the
node→label relation is a forest of parent pointers, and composing it
with itself halves every path's depth, so the distance any label must
travel contracts geometrically. Convergence is O(log diameter) rounds
— a 50-hop chain converges in 5 rounds (asserted in
tests/test_round5_ops.py), and 2^63 ids bound ANY diameter under 63
doubling rounds, so the safety cap below is unreachable rather than a
behavioral limit.

Invariants that make the jump sound:
- ``lbl(x) <= x`` always (labels start at self and only min-decrease),
  so ``lbl`` pointers always point "downhill" — the relation is acyclic.
- ``lbl(x)`` is always the id of a node in x's component (self at
  init; propagation pulls labels across edges; the jump reads the
  label OF a component member), so no label ever crosses components.
- The label sum is strictly decreasing until the fixed point (every
  node holds its component min), giving a one-scalar convergence test:
  the only ``collect()`` in the loop is that aggregated scalar.

Per round: the neighbor-min groupBy plus the self-join jump — more
shuffles than the plain loop's one, paid back exponentially in round
count. At 100 TB each round's shuffles are keyed on node id and the
persisted label table is (node, lbl) int64 pairs only.

Lineage is truncated ONCE per round via
:func:`pypers_spark.functions.checkpoint.iter_checkpoint`, on the
round's final (post-jump) label table: the label table is referenced
four times inside a round (twice building the hop, and the jump
self-join doubles that), so without truncation the logical plan tree
quadruples per round and Catalyst analysis time goes exponential
(caching alone does not shrink the tree the analyzer must walk). With
truncation, the per-round tree is a constant-size four-leaf plan; the
intermediate hop is deliberately NOT materialized — its duplicate
evaluation inside the jump costs one extra node-keyed exchange,
cheaper than a second per-round materialization barrier. On
the local rig that is an eager ``localCheckpoint``; with
``$SPARK_GRAFT_RELIABLE_CHECKPOINT_DIR`` set (a real cluster's HDFS/S3
dir) it becomes reliable ``checkpoint()``, so a lost executor
mid-convergence recovers from durable storage instead of killing a
100 TB dedup job. Plan shape — and therefore the converged labels —
is identical under both (pinned in tests/test_round6_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pypers_spark.functions.checkpoint import iter_checkpoint

# 2^63 node ids bound every component diameter below 63 pointer-doubling
# rounds; 100 adds slack for the interleaving constant. Hitting this cap
# is impossible for int64 ids — kept as a loud invariant check, not a
# tunable.
MAX_CC_ROUNDS = 100

#: Rounds the most recent ``min_label_components`` call took to
#: converge (including the final no-change round) — read by tests to
#: assert the O(log diameter) behavior.
last_rounds: int = 0


def min_label_components(
    edges: DataFrame, labels: DataFrame, persist_key: str
) -> DataFrame:
    """Label every node with its connected component's min node id.

    ``edges``: (src, dst) int64 pairs, both directions present.
    ``labels``: initial (node, lbl) assignment with lbl == node; must
    cover every edge endpoint (extra isolated nodes are fine — they
    keep their own label).
    ``persist_key``: kept for call-site symmetry/diagnostics; the loop
    materializes via :func:`iter_checkpoint` (eager localCheckpoint,
    or reliable checkpoint when the env knob is set — both cache AND
    truncate lineage), so no cache-manager entry outlives the call.
    """
    global last_rounds
    del persist_key  # lineage truncation subsumes keyed persistence
    # Decimal accumulation for the convergence scalar: int64 label sums
    # wrap for any graph beyond a couple of max-range ids, and a round
    # whose exact decrease is a multiple of 2^64 would then read as a
    # (false) fixed point. decimal(38,0) is exact past 10^25 total.
    def _lbl_sum(df: DataFrame):
        return df.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]

    labels = iter_checkpoint(labels)
    prev_sum = _lbl_sum(labels)
    for rounds in range(1, MAX_CC_ROUNDS + 1):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        hop = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # Pointer jump: lbl ← lbl(lbl). Every lbl value is a node id in
        # the table (see module invariants), so the left join always
        # matches; coalesce guards the isolated-node degenerate case.
        # The hop is NOT checkpointed mid-round: the jump's self-join
        # references the hop subtree twice, but `labels` was truncated
        # at the end of the previous round, so the per-round plan stays
        # a constant-size tree (4 labels leaves) — and one
        # materialization per round instead of two cut the sf0.1
        # organic-graph loop from ~9.3 s to ~6 s (the saved
        # localCheckpoint job was pure scheduling tax; the duplicated
        # hop shuffles are tiny next to it, and at cluster scale they
        # trade one barrier for one extra node-keyed exchange).
        parent = hop.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        labels = iter_checkpoint(
            hop.join(parent, hop["lbl"] == parent["p_node"], "left").select(
                "node",
                F.coalesce(F.col("p_lbl"), F.col("lbl")).alias("lbl"),
            )
        )
        new_sum = _lbl_sum(labels)
        if new_sum == prev_sum:  # labels only ever decrease
            last_rounds = rounds
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"min_label_components: no convergence in {MAX_CC_ROUNDS} rounds — "
        "impossible for int64 node ids under pointer doubling; the label "
        "sum failed to reach a fixed point (invariant violation)"
    )
