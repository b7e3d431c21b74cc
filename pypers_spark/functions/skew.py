"""Skew-handling helpers (SURVEY.md §6).

AQE's skew-join splitting handles most runtime skew; these helpers cover
the two cases it cannot: aggregation skew (one hot group overwhelming a
single reducer) and pre-planned join salting when the hot keys are known.

Salting uses Spark's native ``rand``/``pmod`` — cross-engine
determinism is NOT needed here (salt never leaves the plan; results are
salt-independent by construction).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Add a uniform random salt column in ``[0, n_salts)``.

    Deterministic per task attempt (seeded rand), so retries reproduce
    the same partitioning.
    """
    return df.withColumn(col_name, F.pmod(F.floor(F.rand(seed=7) * n_salts), n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    n_salts: int = 16,
    merge_aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates on (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the per-salt partials. The
    default merge re-SUMS every partial column (correct for sum/count);
    for min/max partials pass explicit ``merge_aggs``
    (e.g. ``min_merge(["lo"])``). avg must be decomposed into
    sum+count partials by the caller.

    Example::

        salted_agg(lineitem, ["l_orderkey"],
                   [F.sum("l_quantity").alias("qty"), F.count("*").alias("n")])
    """
    partial = salted(df, n_salts).groupBy(*keys, "_salt").agg(*aggs)
    if merge_aggs is None:
        partial_cols = [c for c in partial.columns if c not in (*keys, "_salt")]
        merge_aggs = [F.sum(name).alias(name) for name in partial_cols]
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys on the big side.

    The big side gets a random salt; the small side is exploded
    ``n_salts``-fold so every (key, salt) combination exists. The join
    shuffles on (key, salt) — a hot key's rows land on ``n_salts``
    reducers instead of one. The small side must tolerate the
    replication (dims, aggregated lookups).
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_exploded = small.withColumn("_salt", F.explode(salts))
    return salted(big, n_salts).join(small_exploded, [key, "_salt"]).drop("_salt")


def min_merge(names: Iterable[str]) -> list[Column]:
    """Merge columns for min-partials in :func:`salted_agg` phase 2."""
    return [F.min(n).alias(n) for n in names]


# Routing threshold for :func:`adaptive_join`: skew_ratio is
# max-key-count × n_keys / total-rows (1.0 = perfectly uniform). Below
# ~4 the hottest reducer holds ≤ 4 partitions' fair share — AQE's
# runtime split absorbs that; above it, pre-planned salting wins
# because the hot key's rows never pile onto one reducer at all.
SKEW_RATIO_THRESHOLD = 4.0

# (session id, plan semanticHash, key) -> measured ratio. The skew
# statistic is a plan-build-time scalar; without the memo every call to
# a builder that routes adaptively (op_adaptive_join) re-runs the
# measurement aggregation — callers like tools/full_correctness.py
# invoke each builder twice (count, then compare) and would pay the
# diagnosis pass each time. semanticHash is canonicalized, so the same
# logical leg at the same SF hits the memo across invocations while a
# different source dir misses it.
_RATIO_MEMO: dict = {}


def key_skew_ratio(df: DataFrame, key: str) -> float:
    """The op_skew_report statistic as one scalar: max key count ×
    n_keys / total rows. Two-level hash aggregation collapsing to a
    single row — the only thing collected is that scalar, and it is
    memoized per (session, plan, key) so repeated plan builds measure
    once. At 100 TB run it over a sample or a cached key-count table;
    the statistic is scale-free (it measures SHAPE, not size)."""
    try:
        memo_key = (id(df.sparkSession), df.semanticHash(), key)
    except Exception:
        memo_key = None
    if memo_key is not None and memo_key in _RATIO_MEMO:
        return _RATIO_MEMO[memo_key]
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            (F.max("n") * F.count(F.lit(1)) / F.sum("n")).alias("ratio")
        )
        .collect()[0]
    )
    ratio = float(row["ratio"]) if row["ratio"] is not None else 1.0
    if memo_key is not None:
        _RATIO_MEMO[memo_key] = ratio
    return ratio


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    threshold: float = SKEW_RATIO_THRESHOLD,
    ratio: float | None = None,
) -> tuple[DataFrame, str, float]:
    """Threshold-driven join routing: diagnose big-side key skew with
    :func:`key_skew_ratio`, then build either a plain equi-join or a
    :func:`salted_join`.

    Returns ``(joined, strategy, ratio)`` with strategy ``"plain"`` or
    ``"salted"`` — callers log the decision (op_adaptive_join emits it
    as a column so the routing itself sits inside the correctness
    gate). Pass ``ratio`` explicitly to reuse an already-computed
    diagnosis (e.g. from a persisted skew report) and skip the
    measurement pass.
    """
    if ratio is None:
        ratio = key_skew_ratio(big, key)
    if ratio > threshold:
        return salted_join(big, small, key, n_salts), "salted", ratio
    return big.join(small, key), "plain", ratio
