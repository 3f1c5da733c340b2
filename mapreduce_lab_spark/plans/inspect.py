"""Physical-plan inspection — the engine's scale-posture assertions.

The reference has no optimizer at all (SURVEY.md §4.1); this engine
delegates everything to Catalyst, which makes "did Catalyst actually
do it?" the thing worth testing. These helpers parse
``df.explain("formatted")`` output so tests can assert the properties
that decide 100 TB viability:

- filters reached the parquet scan (``PushedFilters``),
- the scan reads only needed columns (``ReadSchema`` width),
- bounded dimensions joined via broadcast, not shuffle,
- expressions stayed inside whole-stage codegen.

A plan regression (a filter that stops pushing, a broadcast that
silently becomes a shuffle join) changes no answer at test scale and
destroys the job at production scale — these assertions are how such
regressions fail CI instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All filters pushed into file scans, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists of each file-scan ReadSchema (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def shuffle_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin|ShuffledHashJoin", formatted_plan(df)))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges).

    Formatted mode prints shuffle exchanges as "(N) Exchange" with the
    partitioning on a following Arguments: line; broadcast exchanges
    print as "(N) BroadcastExchange" and don't match.
    """
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    # formatted mode annotates operators with "[codegen id : N]".
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when Catalyst planned a map-side partial aggregate."""
    return bool(re.search(r"HashAggregate.*keys=.*functions=\[partial_", formatted_plan(df))) or (
        "partial_" in formatted_plan(df)
    )
