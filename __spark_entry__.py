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


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each key in ``queries()``.

    Oracles that embed a literal parquet path (op_file_stats needs
    ``read_parquet(..., filename=true)``, which the gate's
    pre-registered views cannot express) are resolved here at call
    time against ``SPARK_GRAFT_ORACLE_SF_DIR`` — defaulting to the
    driver gate's sf0.01 directory, overridable by the full-sweep
    tool for other scale factors.
    """
    import os

    from pypers_spark.operators import DYNAMIC_ORACLES, ORACLES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    out = dict(ORACLES)
    out.update({k: build(sf_dir) for k, build in DYNAMIC_ORACLES.items()})
    return out
