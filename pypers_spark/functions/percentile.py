"""Shuffle-bounded exact interpolated percentiles.

Why not ``F.percentile``: Spark's exact percentile aggregate
(``Percentile.scala``) buffers a value→count OpenHashMap per group and
merges those maps into ONE buffer at the final aggregation. The buffer
is O(distinct values in the group) and lives in a single task's heap —
fine for a low-cardinality column at sf0.1, an OOM on a
high-cardinality double column at 100 TB (``events.value`` ≈ 10^11
distinct), and it defeats partial aggregation (the partial state IS the
full map). The r6 verdict flagged the eight operators using it as the
one remaining single-buffer scale hazard.

The same exact interpolated result is computable with bounded state:

1. ``groupBy(group, value) → count`` — an ordinary hash aggregate:
   partial map-side combine, one shuffle keyed on (group, value), no
   task ever holds more than its partition's distinct values.
2. Cumulative count over distinct values per group (a window over the
   group partitioning) — Spark's sort-based window is an EXTERNAL sort:
   it spills, it cannot OOM the way an aggregate buffer does.
3. The interpolation ranks ``lower = floor(p·(n-1))`` / ``higher =
   ceil(p·(n-1))`` (0-based, exactly Spark's formula) are located by
   the cumulative count crossing — the gaps-and-islands discipline the
   operators already use elsewhere — and combined as
   ``(higher-pos)·v_lo + (pos-lower)·v_hi`` with Spark's own
   short-circuits (``higher == lower`` or ``v_lo == v_hi`` → ``v_lo``)
   so results are bit-identical to ``F.percentile``, not merely close.

For GROUPED percentiles the window partitions by the group key — fully
distributed. For GLOBAL percentiles the window is single-partition, but
it sorts only the DISTINCT values (already reduced by pass 1) and
spills to disk instead of holding a map on one heap — degraded to slow,
never to OOM. (Reference parity: repype has no percentile operator;
this backs the op_percentile_exact / ev_slo_report / ev_rfm_segments /
ev_mad_outliers / op_winsorize / sk_hist_quantile / txt_quality_prune /
txt_curriculum_stages gate family.)

NULL values are dropped before counting (Spark percentile semantics);
a group whose values are ALL null is absent from the output (Spark
would emit a null row — no gated operator has such a group).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    spec: Sequence[tuple[float, str]],
    group_cols: Iterable[str] = (),
    count_alias: str | None = None,
    extra_aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` without Spark's
    O(distinct)-single-buffer ``percentile`` aggregate.

    ``spec``: [(p, out_name), ...] — one output double column per entry,
    bit-identical to ``F.percentile(col, p)``.
    ``group_cols``: optional grouping; output has one row per group.
    ``count_alias``: also emit the per-group count of non-null values.
    ``extra_aggs``: extra aggregate columns evaluated over the
    DISTINCT-VALUE rows (``F.min``/``F.max`` of the value are exact
    there; row-counting aggregates are NOT — use ``count_alias``).
    """
    group_cols = list(group_cols)
    value = F.col(value_col)
    filtered = df.filter(value.isNotNull())
    if group_cols:
        # Pre-cluster on the group keys: HashPartitioning(group_cols)
        # satisfies the groupBy(group_cols, value)'s ClusteredDistribution
        # AND the windows' partitionBy(group_cols), so the whole
        # percentile plan runs on ONE exchange instead of two. The
        # window stage already serializes each group into one partition,
        # so this costs no parallelism the plan had anywhere to spend.
        filtered = filtered.repartition(*group_cols)
    counts = filtered.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_cum = Window.partitionBy(*group_cols).orderBy(value_col)
    w_all = Window.partitionBy(*group_cols)
    rows = counts.select(
        *group_cols,
        value_col,
        "_c",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )

    def rank_value(rank: Column) -> Column:
        # Exactly one distinct-value row covers 1-based rank r:
        # the one with cum - c < r <= cum.
        covered = (F.col("_cum") - F.col("_c") < rank) & (F.col("_cum") >= rank)
        return F.max(F.when(covered, value)).cast("double")

    aggs: list[Column] = []
    for p, name in spec:
        # Spark's Percentile: position = p * (n - 1), 0-based.
        pos = F.lit(float(p)) * (F.col("_n") - F.lit(1)).cast("double")
        lower = F.floor(pos)  # long
        higher = F.ceil(pos)  # long
        v_lo = rank_value(lower + F.lit(1))
        v_hi = rank_value(higher + F.lit(1))
        pos_m = F.max(pos)
        lower_m = F.max(lower).cast("double")
        higher_m = F.max(higher).cast("double")
        interpolated = (higher_m - pos_m) * v_lo + (pos_m - lower_m) * v_hi
        result = (
            F.when(F.max(higher) == F.max(lower), v_lo)
            .when(v_lo == v_hi, v_lo)  # Spark short-circuit: no FP drift
            .otherwise(interpolated)
        )
        aggs.append(result.alias(name))
    if count_alias is not None:
        aggs.append(F.max("_n").alias(count_alias))
    for alias, col in (extra_aggs or {}).items():
        aggs.append(col.alias(alias))
    if group_cols:
        return rows.groupBy(*group_cols).agg(*aggs)
    return rows.agg(*aggs)
