"""Readers and sinks beyond the parquet registry (SURVEY.md §2.E).

All readers return lazy scans; all sinks are plan terminators. Scale
discipline: CSV/JSON readers take explicit schemas (runtime inference
is a full extra pass over the data — acceptable at test scale, a
100 TB mistake); the partitioned sink writes ``partitionBy`` layouts so
downstream reads get partition pruning.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Optional[StructType] = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan. Pass ``schema`` in production; inference needs a full
    extra read of every file."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.options(**options).csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.option("header", header).mode(mode).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: Optional[StructType] = None,
    multiline: bool = False,
    **options,
) -> DataFrame:
    """NDJSON (or multiline JSON) scan; explicit schema preferred."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning properties as
    parquet (both columnar with embedded statistics)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Iterable[str]] = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.orc(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Iterable[str]] = None,
    sort_within_partitions: Optional[Iterable[str]] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Partitioned, optionally sorted parquet sink.

    ``partition_by`` gives readers partition pruning on those columns;
    ``sort_within_partitions`` clusters rows so min/max page stats make
    row-group skipping effective; ``max_records_per_file`` caps file
    size for balanced downstream splits.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_text(
    spark: SparkSession,
    path: str,
    whole_text: bool = False,
    line_sep: Optional[str] = None,
) -> DataFrame:
    """Raw-text scan -> one ``value`` string column.

    ``whole_text=True`` reads each file as a single row (document-per-
    file corpora); otherwise one row per line. Line mode is splittable
    (a 100 TB corpus fans out by byte ranges); whole-text pins a file to
    a task, so keep files << executor memory at scale.
    """
    reader = spark.read.option("wholetext", whole_text)
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-string-column sink (one line per row)."""
    df.write.mode(mode).text(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
) -> DataFrame:
    """Binary-file scan for multimodal ingestion: one row per file with
    ``path``/``modificationTime``/``length``/``content`` (binary) —
    the raw-bytes side of the §2.F multimodal column model; pair with
    ``multimodal.with_media_meta`` to attach typed metadata.

    Not splittable (a file is one row) — at 100 TB the ingest pattern
    is many moderate files, then an immediate repartition + parquet
    rewrite so downstream scans are columnar and splittable.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
