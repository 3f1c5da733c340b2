"""Query registry: one place where every operator declares itself.

Each operator module registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) together with its DuckDB oracle SQL
(or ``None`` for genuinely non-SQL-expressible operators, which the
driver checks rows-only). ``__spark_entry__.py`` just re-exports the
two dicts.

Registration happens at import time; ``load_all()`` imports every
operator module so the registry is complete.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "mapreduce_lab_spark.operators.wordcount",
    "mapreduce_lab_spark.operators.indexer",
    "mapreduce_lab_spark.operators.reference_parity",
    "mapreduce_lab_spark.operators.relational",
    "mapreduce_lab_spark.operators.relational_extra",
    "mapreduce_lab_spark.operators.subqueries",
    "mapreduce_lab_spark.operators.tpch_rest",
    "mapreduce_lab_spark.operators.windows",
    "mapreduce_lab_spark.operators.events",
    "mapreduce_lab_spark.operators.dedup",
    "mapreduce_lab_spark.operators.similarity",
    "mapreduce_lab_spark.operators.clustering",
    "mapreduce_lab_spark.operators.textstats",
    "mapreduce_lab_spark.operators.mapreduce_contract",
    "mapreduce_lab_spark.multimodal.binary_ops",
    "mapreduce_lab_spark.operators.pipeline",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(_ORACLES)
