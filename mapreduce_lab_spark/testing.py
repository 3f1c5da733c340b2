"""Local differential harness: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (row count + schema + order-
insensitive value comparison) so every operator is verified here
before the driver ever sees it. The comparison canonicalizes rows to
strings (floats rounded to a fixed precision) and compares the sorted
multisets, which is equivalent to an order-insensitive value hash.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from decimal import Decimal

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from mapreduce_lab_spark.sources.tables import TABLES

FLOAT_DECIMALS = 6


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the parquet tables registered as views, as the
    driver pre-registers them."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v: object) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.{FLOAT_DECIMALS}f}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sorted-multiset canonical form: columns sorted by name, every
    cell stringified, rows sorted."""
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return out


@dataclass
class DiffResult:
    name: str
    ok: bool
    detail: str = ""


def _col_kind(s: pd.Series) -> str:
    """Coarse type class of a result column, for cross-engine dtype
    compatibility: 'decimal' | 'float' | 'int' | 'bool' | 'datetime' |
    'other'. Spark's toPandas() renders DecimalType as object-of-
    Decimal; DuckDB's fetchdf() renders DOUBLE as float64 — so a
    Decimal-vs-float mismatch is visible here even though both
    stringify to the same 6-dp text downstream."""
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        return "other"
    return "other"


# Kinds the driver's value-hash treats as interchangeable. Decimal is
# deliberately NOT compatible with float: that exact mismatch (Spark
# DECIMAL vs DuckDB DOUBLE) passed this harness in round 1 while
# failing the driver's gate. int-vs-float stays strict too (sum of
# BIGINT should stay integral in both engines); bool-vs-int is allowed
# because DuckDB renders some flags as bool where Spark uses int.
_KIND_COMPAT = {
    ("int", "int"), ("float", "float"), ("decimal", "decimal"),
    ("bool", "bool"), ("datetime", "datetime"), ("other", "other"),
    ("bool", "int"), ("int", "bool"),
}


def live_scan_counts(df: DataFrame) -> dict[str, int]:
    """Per-parquet-table count of FileScan nodes that will actually
    EXECUTE for this DataFrame — the number the 100 TB cost model
    cares about, and what the plan-hygiene sweep audits.

    Counting ``file:.../<t>.parquet`` occurrences in the executed-plan
    TEXT (the round-4 approach) is wrong in two cache-shaped ways:
    a cached subtree's plan nests (recursively) under every
    ``InMemoryRelation`` appearance, so one materialize-once scan
    counts N times, and cached frames left behind by OTHER queries
    plan-substitute into matching subtrees, making the count depend
    on which queries were built earlier in the session (the round-4
    red test). This walks the plan TREE instead:

    - ``InMemoryTableScanExec``: the cached plan materializes once no
      matter how many consumers — count each DISTINCT cached relation's
      subtree exactly once (dedup by JVM identity).
    - ``ReusedExchangeExec`` / ``ReusedSubqueryExec``: reuse of an
      already-materialized result — no re-scan, don't descend.
    - ``AdaptiveSparkPlanExec`` / ``*QueryStageExec``: unwrap to the
      current inner plan.
    - subqueries (scalar/IN): real executions, descended.
    """
    import re

    counts: dict[str, int] = {}
    seen_caches: set[int] = set()
    jvm = df.sparkSession._jvm

    def visit(node: object) -> None:
        cls = node.getClass().getSimpleName()
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            return
        if cls == "AdaptiveSparkPlanExec":
            visit(node.executedPlan())
            subs(node)
            return
        if cls.endswith("QueryStageExec"):
            visit(node.plan())
            return
        if cls == "InMemoryTableScanExec":
            # Catalyst hands each consumer its own column-pruned COPY
            # of the InMemoryRelation; the shared materialize-once
            # identity is the underlying CachedRDDBuilder.
            rel = node.relation()
            key = jvm.java.lang.System.identityHashCode(rel.cacheBuilder())
            if key not in seen_caches:
                seen_caches.add(key)
                visit(rel.cachedPlan())
            return
        if "FileSourceScan" in cls or cls == "BatchScanExec":
            # Prefer the relation's rootPaths over the display string:
            # toString() abbreviates metadata to
            # spark.sql.maxMetadataStringLength (default 100) chars, so
            # a long enough test-data path truncates before the
            # "<table>.parquet" suffix and the regex would miss.
            t = None
            try:
                paths = node.relation().location().rootPaths()
                if paths.size() > 0:
                    m = re.search(r"/(\w+)\.parquet", paths.apply(0).toString())
                    t = m.group(1) if m else None
            except Exception:
                pass
            if t is None:
                m = re.search(r"/(\w+)\.parquet", node.toString().splitlines()[0])
                # Key unmatched scans by node identity so two DIFFERENT
                # unidentifiable scans never merge into one bucket and
                # read as a duplicate scan of a single table.
                t = (
                    m.group(1)
                    if m
                    else f"<unknown@{jvm.java.lang.System.identityHashCode(node)}>"
                )
            counts[t] = counts.get(t, 0) + 1
        kids = node.children()
        for i in range(kids.size()):
            visit(kids.apply(i))
        subs(node)

    def subs(node: object) -> None:
        sq = node.subqueries()
        for i in range(sq.size()):
            visit(sq.apply(i))

    visit(df._jdf.queryExecution().executedPlan())
    return counts


def compare(name: str, spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> DiffResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return DiffResult(name, False, f"schema: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
    if len(sp) != len(du):
        return DiffResult(name, False, f"rowcount: spark={len(sp)} duckdb={len(du)}")
    # Driver-strength dtype gate, checked BEFORE canonicalization:
    # stringifying hides Decimal-vs-double divergence that the driver's
    # schema/hash comparison catches.
    for c in sorted(sp.columns):
        ks, kd = _col_kind(sp[c]), _col_kind(du[c])
        if (ks, kd) not in _KIND_COMPAT:
            return DiffResult(
                name, False, f"dtype: column {c!r} spark={ks} duckdb={kd}"
            )
    a, b = canonical_rows(sp), canonical_rows(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return DiffResult(name, False, f"values differ, first diffs: {diffs}")
    return DiffResult(name, True, f"{len(sp)} rows")
