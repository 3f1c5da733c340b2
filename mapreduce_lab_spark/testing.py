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


def compare(name: str, spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str) -> DiffResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return DiffResult(name, False, f"schema: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
    if len(sp) != len(du):
        return DiffResult(name, False, f"rowcount: spark={len(sp)} duckdb={len(du)}")
    a, b = canonical_rows(sp), canonical_rows(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return DiffResult(name, False, f"values differ, first diffs: {diffs}")
    return DiffResult(name, True, f"{len(sp)} rows")
