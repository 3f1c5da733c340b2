"""ANSI SQL surface probes: LATERAL correlated subqueries and NULL
semantics, as shared Spark+DuckDB SQL text.

Like operators/subqueries.py, each query's SQL IS its oracle — two
independent engines parse and execute the identical string. These two
close out dialect corners the rest of the suite doesn't touch:
LATERAL (per-row dependent subquery with ORDER BY + LIMIT) and the
null-handling trio (null grouping, FILTER aggregates, null-safe
equality join).

The reference has no SQL front-end at all (SURVEY.md §3: "no SQL, no
parser"); this is superset surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def _sql(spark: SparkSession, sf_dir: str, stmt: str, *tables: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(stmt)


# --- LATERAL: top-2 customers per nation ----------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
"""


@query("lateral_top2_customers_per_nation", oracle=_LATERAL_SQL)
def q_lateral_top2_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by balance via a correlated LATERAL
    subquery with ORDER BY + LIMIT (Spark 4 lateral-join support).

    Scale shape: Catalyst decorrelates the lateral limit into a
    partitioned rank — no per-row re-execution of the inner query, no
    nested loop; the customer side shuffles once on c_nationkey and
    the per-key limit truncates inside the shuffle. Equivalent to the
    window-function top-k in windows.py, expressed through the ANSI
    construct users port from other engines.
    """
    return _sql(spark, sf_dir, _LATERAL_SQL, "nation", "customer")


# --- NULL semantics: grouping, FILTER aggregates, null-safe join ----------

# NULLIF manufactures nulls from the (null-free) orders table so the
# probe is self-contained: 'O'-status rows get a NULL group key.
_NULL_SEMANTICS_SQL = """
WITH src AS (
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS st,
           NULLIF(o_orderpriority, '1-URGENT') AS pri
    FROM orders
),
g AS (
    SELECT st,
           count(*) AS n_rows,
           count(pri) AS n_pri,
           count(*) FILTER (WHERE pri IS NULL) AS n_null_pri
    FROM src GROUP BY st
)
SELECT a.st, a.n_rows, a.n_pri, a.n_null_pri, b.n_rows AS self_rows
FROM g a JOIN g b ON a.st IS NOT DISTINCT FROM b.st
"""


@query("null_semantics_probe", oracle=_NULL_SEMANTICS_SQL)
def q_null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pins three ANSI null behaviors cross-engine in one query: (1)
    GROUP BY collects NULL keys into one group; (2) count(col) skips
    nulls while count(*) FILTER counts them; (3) IS NOT DISTINCT FROM
    joins the NULL group to itself (plain `=` would drop it — so
    self_rows == n_rows for every row only under null-safe equality,
    which the hash check enforces).

    Scale shape: one partial+final aggregate, then a 3-row self-join —
    null-safe equality still hash-partitions (nulls are a single key;
    a skewed real-world null population would be salted or filtered
    first, which is why the group frame, not the fact table, feeds the
    null-safe join here).
    """
    return _sql(spark, sf_dir, _NULL_SEMANTICS_SQL, "orders")
