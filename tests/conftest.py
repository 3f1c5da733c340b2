from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_lab_spark.session import get_spark  # noqa: E402
from mapreduce_lab_spark.testing import duckdb_connect  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Small thread count + few shuffle partitions: test data is tiny,
    # scheduler overhead dominates otherwise.
    s = get_spark("mapreduce_lab_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()
