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


_DRIVER_SCALAR_TYPES = {
    "string", "long", "integer", "double", "float", "boolean",
    "date", "timestamp", "decimal", "short", "byte", "binary",
}


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    # Driver-canonicalizer contract (r10 postmortem): the official
    # driver pandas-sorts EVERY output column even for rows-only
    # queries, and pandas cannot factorize list/struct/map cells —
    # ivf_train_codebook's array<double> centroid crashed the harness
    # before the rows-only count. Oracled queries hit the same
    # constraint through compare()'s own canonical sort; rows-only
    # queries are only guarded here.
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.dataType.typeName() not in _DRIVER_SCALAR_TYPES
    ]
    assert not bad, f"{name}: non-scalar output columns crash the driver: {bad}"
    assert df.count() >= 0
