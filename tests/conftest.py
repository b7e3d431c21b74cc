from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pypers_spark.session import get_session

    s = get_session("pypers_spark-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from pypers_spark.sources import load_tables

    return load_tables(spark, sf_dir)


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_check import duck_connection

    return duck_connection(sf_dir)
