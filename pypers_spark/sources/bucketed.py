"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

The 100 TB lever this module exists for: a fact⋈fact join between two
tables bucketed on the SAME key into the SAME bucket count reads
bucket i of each side into the same task — the join runs with ZERO
Exchange on either side. At petabyte scale that turns the recurring
nightly `lineitem ⋈ orders` shuffle (the single most expensive stage of
any TPC-H-shaped pipeline) into a scan-local merge, paid ONCE at write
time instead of per query. Bucketing is Spark's native answer to the
reference engine's hash-clustered storage; tests/test_bucketed.py
asserts the Exchange-free plan mechanically.

Semantics and guardrails:

- ``write_bucketed`` wraps ``DataFrameWriter.bucketBy(...).sortBy(...)``
  + ``saveAsTable``: bucketed layout is METADATA — it lives in the
  session catalog, not in the parquet footers — so bucketed tables must
  be read back via ``spark.table`` (``read_parquet`` on the same path
  would see plain files and shuffle anyway).
- Pass ``path`` to keep the data at an explicit location (external
  table) instead of the session warehouse directory.
- Both sides of a co-located join must agree on bucket COLUMNS and
  COUNT. ``assert_colocated`` checks that contract up front and raises
  with the actual layouts — cheaper than discovering a silent Exchange
  in a 6-hour run.
- Sorting within buckets (``sort_cols``) lets the sort-merge join skip
  its per-task sort when each bucket lands in one file
  (``spark.sql.legacy.bucketedTableScan.outputOrdering`` governs use of
  the sorted property; the Exchange elision needs no flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, intra-bucket-sorted parquet table."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    sort_cols = sort_cols or bucket_cols
    writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, tuple[str, ...]] | None:
    """(bucket count, bucket columns) of a catalog table, or None if the
    table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    cols = tuple(
        c.strip().strip("`") for c in info["Bucket Columns"].strip("[]").split(",")
    )
    return int(info["Num Buckets"]), cols


def assert_colocated(spark: SparkSession, left: str, right: str) -> None:
    """Raise unless ``left`` and ``right`` are bucketed identically (same
    count, same column names) — the precondition for an Exchange-free
    join between them."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        raise ValueError(
            f"co-located join needs both sides bucketed: {left}={ls}, {right}={rs}"
        )
    if ls[0] != rs[0] or len(ls[1]) != len(rs[1]):
        raise ValueError(
            f"bucket layouts differ: {left}={ls}, {right}={rs} — "
            "rewrite one side with matching bucket count/columns"
        )


def colocated_join(
    spark: SparkSession,
    left: str,
    right: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys.

    With both sides bucketed on the join key into the same bucket count,
    Spark plans a sort-merge join whose children are the bucketed scans
    directly — no Exchange, no shuffle, at any scale.
    """
    assert_colocated(spark, left, right)
    lt, rt = spark.table(left), spark.table(right)
    return lt.join(rt, lt[left_on] == rt[right_on], how)
