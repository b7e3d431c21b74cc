"""Every queries() entry vs its DuckDB oracle — the driver's gate, local."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_check import check_query

ALL_KEYS = sorted(entry_mod.queries())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_oracle_coverage():
    oracles = entry_mod.oracle_sql()
    missing = [k for k in ALL_KEYS if k not in oracles]
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    problems = check_query(spark, duck, name, sf_dir)
    assert not problems, f"{name}: {problems}"
