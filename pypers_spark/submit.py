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


if __name__ == "__main__":
    ok = submit_smoke()
    print("submit-smoke:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
