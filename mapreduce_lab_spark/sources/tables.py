"""Parquet table sources for the synthetic star schema.

The reference's only source is a whole-file text scan
(``core/worker.go:122-142``); see ``sources/text.py`` for that
contract. This module is the engine's primary columnar source:
Parquet scans that Catalyst can push filters into and prune columns
from — on a 100 TB lake this is where most of the performance lives
(``.explain`` must show PushedFilters / narrow ReadSchema, which the
declarative loaders here preserve by never materializing eagerly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor: their
# cardinality is fixed (TPC-H regions/nations) or grows sublinearly.
# Fact tables must never be broadcast.
BROADCAST_SAFE = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}
