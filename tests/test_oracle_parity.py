"""Differential test: every registered query vs its DuckDB oracle.

This is the local mirror of the driver's correctness gate — each
queries() entry with an oracle must match on row count, schema
(column names), and order-insensitive canonical values.
"""

from __future__ import annotations

import pytest

from mapreduce_lab_spark import registry
from mapreduce_lab_spark.testing import compare

registry.load_all()
_QUERIES = registry.queries()
_ORACLES = registry.oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    res = compare(name, _QUERIES[name](spark, sf_dir), duck, _ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
