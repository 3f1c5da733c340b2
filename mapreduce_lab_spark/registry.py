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


def _previously_sampled() -> tuple[set[str], int]:
    """(query names with a driver correctness row, number of committed
    rounds), read from the ``CORRECTNESS_r*.json`` artifacts at the
    repo root.

    Used only to ROTATE ordering (below); returns empty — and ordering
    degrades gracefully to plain interleaving — if the artifacts are
    absent (fresh checkout, tests run from another cwd). Ordering is
    deterministic for a given checkout: it depends only on committed
    artifacts, never on wall clock or filesystem state outside them.
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    n_rounds = 0
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):  # a non-dict artifact is not ours
            seen.update(data.keys())
            n_rounds += 1
    return seen, n_rounds


def _interleaved_names() -> list[str]:
    """Round-robin across operator modules (families), preserving each
    module's own registration order, weaving never-driver-sampled
    queries 3:1 with a ROTATING slice of already-verified ones.

    The dict ordering here is the order a correctness driver visits
    queries in. A flat module-by-module ordering means a driver that
    checks only the first N queries (by count or time budget) never
    reaches whole families at the tail — in round 1 the first 49
    entries stopped mid-TPC-H, leaving windows/events/dedup/similarity/
    textstats/multimodal with no driver row at all. Interleaving one
    query per family per pass makes any prefix of the ordering a
    representative sample of every family.

    Two failure modes balanced against each other (ADVICE r3): pure
    unseen-first ordering means a prefix-sampling driver NEVER
    re-checks a verified query, so regressions in them go undetected
    forever; pure static ordering means tail families never get a
    first driver row. The weave takes three unseen queries, then one
    previously-seen query, until both streams drain — so any driver
    prefix is ~75% fresh coverage and ~25% regression re-checks. The
    seen stream is rotated by the committed round count, so WHICH
    quarter gets re-checked advances round over round instead of
    pinning to the same heads.
    """
    seen, n_rounds = _previously_sampled()
    lanes = [list(_BY_MODULE.get(m, [])) for m in _OPERATOR_MODULES]
    for m in _BY_MODULE:  # modules not in the canonical list, if any
        if m not in _OPERATOR_MODULES:
            lanes.append(list(_BY_MODULE[m]))

    # HEAD: exactly one query per family, so ANY >=|families| prefix
    # samples every family (the round-1 lesson, pinned by
    # test_registry_prefix_samples_every_family). Prefer an unseen
    # query; a fully-verified family contributes a round-rotated
    # re-check instead.
    head: list[str] = []
    for lane in lanes:
        if not lane:
            continue
        unseen_lane = [n for n in lane if n not in seen]
        head.append(unseen_lane[0] if unseen_lane else lane[n_rounds % len(lane)])
    picked = set(head)

    def weave(split_lanes: list[list[str]]) -> list[str]:
        mx = max((len(lane) for lane in split_lanes), default=0)
        return [lane[i] for i in range(mx) for lane in split_lanes if i < len(lane)]

    rest = [[n for n in lane if n not in picked] for lane in lanes]
    fresh = weave([[n for n in lane if n not in seen] for lane in rest])
    resample = weave([[n for n in lane if n in seen] for lane in rest])
    if resample:
        k = (n_rounds * max(1, len(resample) // 4)) % len(resample)
        resample = resample[k:] + resample[:k]
    out = head
    fi = ri = 0
    while fi < len(fresh) or ri < len(resample):
        for _ in range(3):
            if fi < len(fresh):
                out.append(fresh[fi])
                fi += 1
        if ri < len(resample):
            out.append(resample[ri])
            ri += 1
    return out


def queries() -> dict[str, QueryFn]:
    load_all()
    order = _interleaved_names()
    return {n: _QUERIES[n] for n in order}


def oracles() -> dict[str, str]:
    load_all()
    order = _interleaved_names()
    return {n: _ORACLES[n] for n in order if n in _ORACLES}
