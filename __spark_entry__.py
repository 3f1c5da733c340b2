"""Driver contract for the spark-graft builder (PySpark target).

Thin aggregator over ``mapreduce_lab_spark.registry``: every operator
module registers its named query callable together with its DuckDB
oracle SQL; see ``mapreduce_lab_spark/operators/`` for the
implementations and SURVEY.md §2 for the inventory they cover.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_lab_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (word count, reference A1+A2) on sf0.001."""
    from mapreduce_lab_spark.operators.wordcount import q_wordcount

    return q_wordcount(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each queries() entry (omitted → rows-only check)."""
    return registry.oracles()


def describe() -> dict[str, dict[str, str]]:
    """Per-query metadata (description, oracle class, module, and lane
    routing tags such as the embedding near-dup tight/loose-threshold
    split) — readable by a driver-side consumer without opening
    operator source."""
    return registry.describe()
