"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the
dot product JVM-side for the oracle-checked paths; the batch ANN scan has
a numpy Pandas-UDF fast path in ``operators/similarity.py`` for the
brute-force top-k where Arrow batching wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def duck_dot(a: str, b: str) -> str:
    """DuckDB fragment equivalent to :func:`dot` (list_dot_product)."""
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def duck_cosine(a: str, b: str) -> str:
    """DuckDB fragment equivalent to :func:`cosine_similarity`."""
    return (
        f"CASE WHEN sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])) > 0 THEN "
        f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))) ELSE 0.0 END"
    )
