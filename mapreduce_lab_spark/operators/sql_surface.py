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

from mapreduce_lab_spark.functions.numeric import oracle_exact_sum
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


# --- collation-aware grouping ---------------------------------------------

# Mixed-case segment values manufactured deterministically (the raw
# table is single-case), so the collation has real work to do.
_MIXED_SEG_SPARK = (
    "CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment) ELSE c_mktsegment END"
)


@query(
    "collated_segment_rollup",
    oracle=f"""
    WITH src AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg_m,
               c_acctbal
        FROM customer
    )
    SELECT lower(seg_m) AS segment, count(*) AS n_customers,
           ({oracle_exact_sum('c_acctbal', 100)}) AS total_acctbal
    FROM src GROUP BY lower(seg_m)
    """,
)
def q_collated_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a COLLATE UTF8_LCASE key (new in
    Spark 4) over a deterministically mixed-case column; the oracle
    reproduces the grouping with lower().

    Collated grouping beats normalize-then-group when the original
    casing must survive alongside (here the representative is reduced
    with min(lower(..)) so both engines emit identical keys). The
    collation is carried in the column type, so the hash partitioning
    and partial aggregation remain map-side combinable — same
    scale shape as any single-key rollup.
    """
    from pyspark.sql import functions as F

    from mapreduce_lab_spark.functions.numeric import exact_sum

    src = load_table(spark, sf_dir, "customer").selectExpr(
        f"{_MIXED_SEG_SPARK} AS seg_m", "c_acctbal"
    )
    return (
        src.groupBy(F.expr("collate(seg_m, 'UTF8_LCASE')").alias("_ck"))
        .agg(
            F.min(F.lower("seg_m")).alias("segment"),
            F.count("*").alias("n_customers"),
            exact_sum("c_acctbal", 100).alias("total_acctbal"),
        )
        .select("segment", "n_customers", "total_acctbal")
    )
