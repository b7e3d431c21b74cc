"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each. Column names
and types are aligned pairwise (see operator modules in
``pypers_spark/operators/``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    from pypers_spark.sources import load_tables

    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir)
        return fn(tables)

    return runner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from pypers_spark.operators.relational import q1_pricing_summary
    from pypers_spark.sources import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001")
    return q1_pricing_summary(tables)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pypers_spark.operators import REGISTRY

    return {name: _wrap(fn) for name, fn in REGISTRY.items()}


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each key in ``queries()``.

    Oracles that embed a literal parquet path (op_file_stats needs
    ``read_parquet(..., filename=true)``, which the gate's
    pre-registered views cannot express) are resolved here at call
    time. Pass ``sf_dir`` explicitly (the comparator tools do) so the
    dynamic oracles are guaranteed to read the SAME tables the Spark
    side ran against; the ``SPARK_GRAFT_ORACLE_SF_DIR`` env var is the
    fallback for zero-arg callers (the driver gate), defaulting to the
    gate's sf0.01 directory.
    """
    import os

    from pypers_spark.operators import DYNAMIC_ORACLES, ORACLES

    if sf_dir is None:
        sf_dir = os.environ.get(
            "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
        )
    out = dict(ORACLES)
    out.update({k: build(sf_dir) for k, build in DYNAMIC_ORACLES.items()})
    return out
