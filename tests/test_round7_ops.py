"""Round-7 hardening: scale-safe exact percentiles + executor-loss
resilience evidence (r6 verdict items #1 and #4)."""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F


def test_exact_percentiles_bitwise_vs_spark_aggregate(spark, sf_dir):
    """The shuffle-bounded plan must be BIT-identical to F.percentile
    (same position formula + short-circuits), grouped and global,
    double and integer columns — not merely equal after rounding."""
    from pypers_spark.functions.percentile import exact_percentiles
    from pypers_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    ref = li.groupBy("l_returnflag").agg(
        *[F.percentile(F.col("l_extendedprice"), F.lit(q)).alias(f"q{i}") for i, q in enumerate(qs)]
    )
    got = exact_percentiles(
        li, "l_extendedprice", [(q, f"q{i}") for i, q in enumerate(qs)],
        group_cols=["l_returnflag"],
    )
    ref_rows = {r["l_returnflag"]: tuple(r)[1:] for r in ref.collect()}
    got_rows = {r["l_returnflag"]: tuple(r)[1:] for r in got.collect()}
    assert ref_rows == got_rows
    # integer-typed column, global (n=1-per-value heavy) — still bitwise
    ev_ref = t["events"].agg(F.percentile(F.col("user_id"), F.lit(0.37)).alias("p")).collect()[0]["p"]
    ev_got = exact_percentiles(t["events"], "user_id", [(0.37, "p")]).collect()[0]["p"]
    assert ev_ref == ev_got


def test_exact_percentiles_partial_aggregation_in_plan(spark, sf_dir):
    """The scale property itself: the counting pass must partial-agg
    map-side (Spark's exact percentile aggregate can't — its partial
    state IS the full value map), and no exact percentile aggregate may
    appear anywhere in the plan."""
    import re

    from pypers_spark.functions.percentile import exact_percentiles
    from pypers_spark.sources import load_tables

    t = load_tables(spark, sf_dir)
    df = exact_percentiles(
        t["events"], "value", [(0.5, "p50")], group_cols=["event_type"]
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert not re.search(r"(?<!approx_)percentile\(", plan)


def test_executor_loss_recovers_via_reliable_checkpoint():
    """r6 verdict #4: turn the 'executor-loss-tolerant' claim into
    evidence. Runs in a SUBPROCESS (an in-process builder would reuse
    the suite's local[4] context): local-cluster[2,2,2048] with the
    reliable-checkpoint knob set, one executor JVM SIGKILLed mid
    pointer-doubling, convergence to exactly-correct labels required —
    AND the kill itself is required, so a too-fast loop can't
    vacuously pass."""
    proc = subprocess.run(
        [sys.executable, "-m", "pypers_spark", "--executor-loss-smoke"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "executor-loss-smoke: PASS" in proc.stdout
    assert "SIGKILL executor pid" in proc.stderr
