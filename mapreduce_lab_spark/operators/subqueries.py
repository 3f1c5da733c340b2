"""Subquery surface: EXISTS / NOT EXISTS, IN + HAVING, and scalar
subqueries (correlated and uncorrelated), exercised through the SQL
front-end.

The reference has no subqueries (it has no joins at all —
SURVEY.md §2.3; nearest construct is the shuffle gather,
``core/worker.go:78-120``). This module is therefore pure superset
surface, and it deliberately goes through ``spark.sql`` rather than
the DataFrame API: correlated subqueries are exactly the construct
the DataFrame API cannot express directly, and Catalyst's
decorrelation rules (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery) turn them into the semi/anti/aggregate
joins a 1000-executor plan needs — no driver-side loops, no
per-row re-execution of the inner query.

Each query's SQL text is ALSO its DuckDB oracle, verbatim. That is
the strongest parity check available (two independent engines parse
and plan the identical ANSI string), and it constrains the SQL to
the dialect-safe subset: TIMESTAMP literals, EXISTS/IN, exact
fixed-point integer math per functions/numeric.py.  One dialect trap
worth recording: ``CAST(round(x) AS BIGINT)`` is only portable
because ``round`` returns an integer-valued double — Spark's
double→long cast truncates while DuckDB's rounds, which agree on
exact integers and nothing else.

Scale posture: every subquery here decorrelates to a join on a key
(o_orderkey / c_custkey / l_partkey) followed by partial+final
aggregation — shuffle-on-key plans that scale linearly. None of
them fall back to a nested-loop or driver-side evaluation;
tests/test_plan_quality.py asserts the EXISTS/IN plans contain
semi/anti joins and no BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_lab_spark.functions.numeric import oracle_exact_sum, oracle_units
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def _sql(spark: SparkSession, sf_dir: str, stmt: str, *tables: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(stmt)


# --- EXISTS: TPC-H Q4 adapted to this schema ------------------------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@query("q4_exists_order_priority", oracle=_Q4_SQL)
def q4_exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority in 1997Q1 having at least one returned line.

    Catalyst rewrites the EXISTS into a LEFT SEMI join on
    l_orderkey: the lineitem side is filtered (l_returnflag pushed to
    the scan) before the shuffle, and the semi join short-circuits
    per key — never materializing the multiplicity of matches, which
    at 100 TB is the difference between shuffling matched *keys* and
    shuffling every matching row.
    """
    return _sql(spark, sf_dir, _Q4_SQL, "orders", "lineitem")


# --- NOT EXISTS: anti-join via predicate subquery -------------------------

_NOT_EXISTS_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       ({oracle_exact_sum('c_acctbal', 100)}) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
"""


@query("not_exists_no_big_order", oracle=_NOT_EXISTS_SQL)
def not_exists_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order over 300k, by segment, with their exact
    balance sum. NOT EXISTS → LEFT ANTI join on c_custkey; the
    o_totalprice filter is pushed below the join so the anti side
    shuffles only qualifying orders."""
    return _sql(spark, sf_dir, _NOT_EXISTS_SQL, "customer", "orders")


# --- IN + HAVING: TPC-H Q18 flavor ----------------------------------------

_IN_HAVING_SQL = """
SELECT c.c_custkey, c.c_name, count(*) AS n_orders
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IN (SELECT o_custkey FROM orders
                      GROUP BY o_custkey HAVING count(*) >= 15)
GROUP BY c.c_custkey, c.c_name
"""


@query("in_subquery_frequent_buyers", oracle=_IN_HAVING_SQL)
def in_subquery_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with >= 15 orders and their order counts (Q18 shape).

    The IN-subquery decorrelates to a semi join against a pre-
    aggregated orders projection; the outer join and the subquery's
    groupBy hash on the same key (o_custkey), so AQE coalesces them
    into one shuffle lineage rather than two independent scans being
    shuffled separately.
    """
    return _sql(spark, sf_dir, _IN_HAVING_SQL, "customer", "orders")


# --- uncorrelated scalar subquery -----------------------------------------

_ABOVE_AVG_SQL = f"""
SELECT p_brand, count(*) AS n_above_avg
FROM part
WHERE {oracle_units('p_retailprice', 100)} * (SELECT count(*) FROM part)
      > (SELECT sum({oracle_units('p_retailprice', 100)}) FROM part)
GROUP BY p_brand
"""


@query("scalar_subquery_above_avg_price", oracle=_ABOVE_AVG_SQL)
def scalar_subquery_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above the global average, per brand.

    The mean comparison is kept exact by cross-multiplying integer
    units (price*n > sum) instead of dividing — no float threshold
    for boundary rows to flip on. The two scalar subqueries become
    single-row aggregates broadcast into the filter: one extra pass
    over one column, no shuffle of the outer table.
    """
    return _sql(spark, sf_dir, _ABOVE_AVG_SQL, "part")


# --- correlated scalar subqueries: TPC-H Q17 flavor -----------------------

_Q17_SQL = f"""
SELECT count(*) AS n_small,
       ({oracle_exact_sum('l_extendedprice', 100)}) AS total_price
FROM lineitem l
WHERE 5 * {oracle_units('l.l_quantity', 100)}
        * (SELECT count(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum({oracle_units('l2.l_quantity', 100)}) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total price of lineitems with quantity below 20% of their
    part's average quantity (Q17 shape, exact integer form:
    5*qty*count < sum ⇔ qty < 0.2*avg, no float division).

    Each correlated scalar aggregate decorrelates to a per-partkey
    aggregation joined back to lineitem — the plan aggregates n rows
    to ~n/30 keys and equi-joins, rather than re-running the inner
    query per outer row (the O(n²) trap a naive executor would hit).
    """
    return _sql(spark, sf_dir, _Q17_SQL, "lineitem")


# --- correlated argmin: TPC-H Q2 flavor -----------------------------------

# Unit price as one double division of exact integers: bit-identical
# per row in both engines, so min() and the equality against it are
# float-safe (same doubles, any order). CAST AS DOUBLE, not `* 1.0`:
# Spark types the literal 1.0 as DECIMAL(2,1) and would propagate
# decimal through the whole expression (DuckDB keeps double).
_UNIT = (
    f"(CAST({oracle_units('{p}l_extendedprice', 100)} AS DOUBLE)"
    f" / {oracle_units('{p}l_quantity', 100)})"
)

_Q2_SQL = f"""
SELECT l.l_partkey AS p_partkey,
       min(l.l_suppkey) AS best_supp,
       CAST(floor(min({_UNIT.format(p='l.')}) * 10000) AS DOUBLE) / 10000 AS unit_price
FROM lineitem l
WHERE {_UNIT.format(p='l.')}
      = (SELECT min({_UNIT.format(p='l2.')}) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey
"""


@query("q2_cheapest_supplier_per_part", oracle=_Q2_SQL)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part: the supplier offering the minimum unit price (Q2's
    correlated-argmin shape on this schema; ties resolved to the
    smallest supplier id). Output price is floored to 4 dp — floor of
    identical doubles is identical, where round() diverges between
    engines on half-way decimals (see functions/numeric.py).

    Decorrelates to a per-partkey min joined back on the key — the
    same one-aggregation-plus-equi-join shape as Q17, selecting the
    argmin ROW rather than comparing against it. A window-function
    rank-and-filter is the DataFrame-API twin of this plan
    (window_top_orders_per_customer); both shuffle once on the key.
    """
    return _sql(spark, sf_dir, _Q2_SQL, "lineitem")
