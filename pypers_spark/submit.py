"""Cluster-mode packaging: spark-submit artifacts + a multi-executor smoke.

Everything else in the repo runs on ``local[N]`` — one JVM, where a
driver-only bug (closures capturing unpicklable state, Python workers
missing the package, absolute-path assumptions) can hide. This module
makes the 100 TB deployment story concrete and TESTED:

- :func:`build_package_zip` — zip ``pypers_spark`` for
  ``spark-submit --py-files`` (the standard way Python code reaches
  executors; no install step on workers).
- :func:`submit_template` — the spark-submit command + conf mapping the
  engine's env knobs (session.py) to cluster settings, with the
  executor-count arithmetic spelled out.
- :func:`submit_smoke` — runs representative queries on a
  ``local-cluster[2,2,2048]`` master: REAL separate executor JVMs with
  their own Python workers, so package shipping, closure pickling, and
  Arrow UDF paths are exercised across process boundaries (the closest
  a single box gets to a real cluster). ``python -m pypers_spark
  --submit-smoke`` is the CI entry.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

PKG_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(PKG_DIR)


def build_package_zip(dest: str | None = None) -> str:
    """Zip the ``pypers_spark`` package for ``--py-files`` shipping.

    Pure-source zip (no .pyc, no tests): executors import from it
    directly off the zip on their sys.path.
    """
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "pypers_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG_DIR):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                arc = os.path.relpath(path, REPO_DIR)
                zf.write(path, arc)
    return dest


def submit_template(
    executors: int = 100, cores: int = 4, executor_mem: str = "16g"
) -> str:
    """The spark-submit invocation for a real cluster, env knobs mapped.

    The shuffle-partition arithmetic: total cores = executors × cores;
    2–3 partitions per core keeps every core busy through stragglers
    while AQE coalesces the small ones — so SPARK_GRAFT_SHUFFLE_PARTITIONS
    ≈ 2.5 × total cores. maxPartitionBytes stays at 128 MB so a 100 TB
    scan yields ~800k input splits amortized over the fleet.
    """
    shuffle = int(executors * cores * 2.5)
    return f"""spark-submit \\
  --master yarn --deploy-mode cluster \\
  --num-executors {executors} --executor-cores {cores} \\
  --executor-memory {executor_mem} \\
  --py-files pypers_spark.zip \\
  --conf spark.sql.adaptive.enabled=true \\
  --conf spark.sql.shuffle.partitions={shuffle} \\
  --conf spark.sql.files.maxPartitionBytes=134217728 \\
  --conf spark.executorEnv.SPARK_GRAFT_CHECKPOINT_DIR=hdfs:///tmp/pypers_ckpt \\
  your_job.py
# env knobs consumed by pypers_spark.session.get_session:
#   SPARK_GRAFT_NO_MASTER=1              (master comes from spark-submit)
#   SPARK_GRAFT_SHUFFLE_PARTITIONS={shuffle}
#   SPARK_GRAFT_DRIVER_MEM=8g
"""


def submit_smoke(verbose: bool = True) -> bool:
    """Multi-executor smoke: build the zip, start ``local-cluster[2,2,2048]``
    (two real executor JVMs, 2 cores / 2 GB each), ship the zip, and run
    one JVM-side query (q1 — codegen + shuffle + broadcast across
    executors) and one Arrow-UDF query (mm_features_hist — proves the
    shipped zip reaches executor-side PYTHON workers, the exact failure
    mode local[N] cannot catch). Returns True when both produce rows.

    Data dir comes from ``$SPARK_GRAFT_SMOKE_DIR`` (default: the rig's
    sf0.001 parquet) so the CI entry works on machines with other layouts.
    """
    from pyspark.sql import SparkSession

    zip_path = build_package_zip()
    spark = (
        SparkSession.builder.appName("pypers_spark-submit-smoke")
        .master("local-cluster[2,2,2048]")
        .config("spark.submit.pyFiles", zip_path)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executor.memory", "1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.sparkContext.setLogLevel("ERROR")
        # Belt and braces: addPyFile also covers clusters where
        # spark.submit.pyFiles is consumed at submit time only.
        spark.sparkContext.addPyFile(zip_path)
        execs = spark.sparkContext.getConf().get("spark.master")
        if verbose:
            print(f"smoke master: {execs}, pyFiles: {zip_path}", file=sys.stderr)

        from pypers_spark.operators.relational import q1_pricing_summary
        from pypers_spark.operators.text import mm_features_hist
        from pypers_spark.sources import load_tables

        tables = load_tables(
            spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
        )
        n_q1 = q1_pricing_summary(tables).count()
        n_mm = mm_features_hist(tables).count()
        if verbose:
            print(f"q1 rows: {n_q1}, mm_features rows: {n_mm}", file=sys.stderr)
        return n_q1 > 0 and n_mm > 0
    finally:
        spark.stop()


def _executor_pids() -> list[int]:
    """PIDs of the standalone-cluster executor JVMs on this box."""
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "CoarseGrainedExecutorBackend" in cmd:
            pids.append(int(pid))
    return pids


def executor_loss_smoke(verbose: bool = True) -> bool:
    """Kill a real executor JVM mid pointer-doubling and still converge.

    The r6 verdict's gap: the reliable-checkpoint knob
    (``SPARK_GRAFT_RELIABLE_CHECKPOINT_DIR``) was asserted for label
    convergence with the dir SET, but never under an actual executor
    loss — ``local[N]`` cannot kill an executor. This smoke can:
    ``local-cluster[2,2,2048]`` starts two real executor JVMs; a
    watcher thread waits until the connected-components loop has
    written several reliable checkpoints (i.e. is mid-convergence),
    then SIGKILLs one executor. Standalone spawns a replacement; the
    loop's lineage bottoms out at the checkpoint files on disk, so the
    retried stages recompute from durable storage instead of dying on
    missing cached blocks. PASS requires BOTH that an executor was
    actually killed and that the converged labels are exactly correct
    (every chain node labeled with the chain min).
    """
    import shutil
    import signal
    import threading
    import time

    from pyspark.sql import SparkSession

    ckpt_dir = tempfile.mkdtemp(prefix="pypers_reliable_ckpt_")
    os.environ["SPARK_GRAFT_RELIABLE_CHECKPOINT_DIR"] = ckpt_dir
    spark = (
        SparkSession.builder.appName("pypers_spark-executor-loss-smoke")
        .master("local-cluster[2,2,2048]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executor.memory", "1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    killed: list[int] = []
    try:
        spark.sparkContext.setLogLevel("ERROR")
        from pyspark.sql import functions as F

        from pypers_spark.functions import components

        n = 4000  # chain 0-1-2-...-3999: every label must converge to 0
        ids = spark.range(n).select(F.col("id").cast("long"))
        fwd = ids.filter(F.col("id") < n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        labels0 = ids.select(F.col("id").alias("node"), F.col("id").alias("lbl"))

        def _kill_one_when_mid_loop() -> None:
            # Each iter_checkpoint writes one rdd-N dir under the
            # context's checkpoint UUID dir — ≥4 means the loop is well
            # inside convergence (round 2 of ~12), the moment a real
            # cluster would lose a node.
            deadline = time.time() + 240
            while time.time() < deadline:
                n_ckpts = sum(
                    1
                    for root, dirs, _files in os.walk(ckpt_dir)
                    for d in dirs
                    if d.startswith("rdd-")
                )
                if n_ckpts >= 4:
                    pids = _executor_pids()
                    if pids:
                        os.kill(pids[0], signal.SIGKILL)
                        killed.append(pids[0])
                        if verbose:
                            print(
                                f"executor-loss-smoke: SIGKILL executor pid "
                                f"{pids[0]} after {n_ckpts} checkpoints",
                                file=sys.stderr,
                            )
                        return
                time.sleep(0.3)

        watcher = threading.Thread(target=_kill_one_when_mid_loop, daemon=True)
        watcher.start()
        result = components.min_label_components(edges, labels0, "smoke.cc")
        rows = result.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("lbl") == 0, 1).otherwise(0)).alias("n_zero"),
        ).collect()[0]
        watcher.join(timeout=5)
        ok = bool(killed) and rows["n"] == n and rows["n_zero"] == n
        if verbose:
            print(
                f"executor-loss-smoke: killed={killed} rounds="
                f"{components.last_rounds} labels {rows['n_zero']}/{rows['n']} == 0",
                file=sys.stderr,
            )
        return ok
    finally:
        spark.stop()
        os.environ.pop("SPARK_GRAFT_RELIABLE_CHECKPOINT_DIR", None)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    if "--executor-loss" in sys.argv[1:]:
        ok = executor_loss_smoke()
        print("executor-loss-smoke:", "PASS" if ok else "FAIL")
    else:
        ok = submit_smoke()
        print("submit-smoke:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
