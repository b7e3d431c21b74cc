"""Every registered query must be empty-input clean: 0-row source
tables (same schemas) produce a plan that executes without error.

At 100 TB this is the partition-pruned-to-nothing / fresh-ingest-dir
case — an operator that throws on empty input kills a scheduled
pipeline run the first time a filter prunes everything.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from pypers_spark.sources.registry import TABLES, load_tables

ALL_KEYS = sorted(entry_mod.queries())


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """A scale-factor dir with every table present but 0 rows."""
    d = tmp_path_factory.mktemp("empty_sf")
    tables = load_tables(spark, sf_dir)
    for name in TABLES:
        tables[name].limit(0).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = entry_mod.queries()[name](spark, empty_sf_dir)
    assert df.count() >= 0  # executes cleanly; almost always 0 rows
