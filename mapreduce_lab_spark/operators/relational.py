"""Relational superset — everything SURVEY.md §2.3 marks ABSENT in
the reference, expressed declaratively so Catalyst plans it.

Design rules applied throughout (the 100 TB posture):

- Filters appear before joins/aggregations in the declared plan and
  reference only scan columns → Catalyst pushes them into the
  Parquet scan (PushedFilters) and prunes columns (ReadSchema).
- Dimension tables (region, nation, supplier) are explicitly
  ``broadcast()`` — their cardinality is bounded, so no shuffle of
  the fact side is ever needed to join them.
- Fact-fact joins (lineitem ⋈ orders) are left to Catalyst's
  sort-merge with AQE skew handling; both sides shuffle on the join
  key once and aggregations that follow reuse that partitioning
  where possible (group keys prefixed by the join key).
- Every aggregate is algebraic (sum/count/avg/min/max) so Catalyst
  inserts map-side partial aggregation; no holistic collect_* on
  unbounded groups in this module.
- Numeric outputs are rounded (2-4 dp) so results hash-match the
  DuckDB oracle despite floating-point summation-order differences;
  dates/timestamps are emitted as formatted strings for the same
  reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_avg,
    exact_ratio,
    oracle_exact_avg,
    oracle_exact_ratio,
    oracle_exact_sum,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

# Revenue expression shared by Q3/Q5: exact 4-decimal fixed point.
_REV_SQL = oracle_exact_sum("l_extendedprice * (1 - l_discount)", 10000)


def _rev_units():
    return to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# --- TPC-H Q1: full-scan hash aggregation with algebraic aggregates ---
# All money aggregates use exact fixed-point units (functions/numeric.py)
# so results are bit-identical across engines and summation orders.
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_exact_sum('l_quantity', 100)}                                             AS sum_qty,
           {oracle_exact_sum('l_extendedprice', 100)}                                        AS sum_base_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)', 10000)}                   AS sum_disc_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)}   AS sum_charge,
           {oracle_exact_avg(f'sum({oracle_units("l_quantity", 100)})', 'count(*)', 100)}    AS avg_qty,
           {oracle_exact_avg(f'sum({oracle_units("l_extendedprice", 100)})', 'count(*)', 100, 10000)} AS avg_price,
           {oracle_exact_avg(f'sum({oracle_units("l_discount", 100)})', 'count(*)', 100)}    AS avg_disc,
           count(*)                                                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(to_units("l_quantity", 100)).alias("_qty_u"),
            F.sum(to_units("l_extendedprice", 100)).alias("_price_u"),
            F.sum(to_units(disc_price, 10000)).alias("_dp_u"),
            F.sum(to_units(disc_price * (1 + F.col("l_tax")), 1000000)).alias("_ch_u"),
            F.sum(to_units("l_discount", 100)).alias("_disc_u"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (F.col("_qty_u") / 100.0).alias("sum_qty"),
            (F.col("_price_u") / 100.0).alias("sum_base_price"),
            (F.col("_dp_u") / 10000.0).alias("sum_disc_price"),
            (F.col("_ch_u") / 1000000.0).alias("sum_charge"),
            exact_avg(F.col("_qty_u"), F.col("count_order"), 100).alias("avg_qty"),
            exact_avg(F.col("_price_u"), F.col("count_order"), 100, 10000).alias("avg_price"),
            exact_avg(F.col("_disc_u"), F.col("count_order"), 100).alias("avg_disc"),
            "count_order",
        )
    )


# --- TPC-H Q3-style: fact-fact join + top-k by aggregate ---
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV_SQL} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    # customer is the small side of customer⋈orders: broadcast it so only
    # the orders⋈lineitem join shuffles (on the shared orderkey).
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5-style: snowflake join through broadcast dimensions ---
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {_REV_SQL} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    # region→nation→supplier are all broadcast: the fact tables only
    # shuffle on orderkey/custkey, never on the dimension keys.
    return (
        t["lineitem"]
        .join(orders, t["lineitem"].l_orderkey == orders.o_orderkey)
        .join(t["customer"], orders.o_custkey == t["customer"].c_custkey)
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
    )


# --- semi / anti joins ---
@query(
    "semi_join_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    """,
)
def semi_join_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "anti_join_customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
)
def anti_join_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# --- outer join with null-producing side ---
@query(
    "left_join_order_counts",
    oracle=f"""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           coalesce({oracle_exact_sum('o_totalprice', 100)}, 0.0) AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(to_units("o_totalprice", 100)) / 100.0, F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


# --- rollup / cube / grouping sets ---
@query(
    "rollup_order_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {oracle_exact_sum('o_totalprice', 100)} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), (F.sum(to_units("o_totalprice", 100)) / 100.0).alias("total")
    )


@query(
    "cube_lineitem_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {oracle_exact_sum('l_quantity', 100)} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), (F.sum(to_units("l_quantity", 100)) / 100.0).alias("qty")
    )


# --- distinct aggregates ---
@query(
    "distinct_aggregates",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


# --- set operations ---
@query(
    "set_ops_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.intersect(supp_nations)


@query(
    "except_nations_without_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract() is EXCEPT DISTINCT (set semantics) — exceptAll would
    # keep keys whose left multiplicity merely exceeds the right one.
    return cust_nations.subtract(supp_nations)


@query(
    "union_all_keys",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
)
def union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.unionAll(supp).groupBy("k").agg(F.count("*").alias("n"))


# --- top-k / order-by-limit ---
@query(
    "topk_expensive_parts",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25
    """,
)
def topk_expensive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy().limit(k) plans as TakeOrderedAndProject: each partition
    # keeps only its local top-k, the driver merges k×partitions rows —
    # no global sort, no full shuffle, scales to any input size.
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_retailprice"), "p_partkey")
        .limit(25)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


# --- string functions ---
@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                    AS brand_upper,
           lower(p_type)                     AS type_lower,
           length(p_name)                    AS name_len,
           substr(p_name, 1, 5)              AS name_prefix,
           concat(p_brand, ':', p_type)      AS brand_type,
           replace(p_type, 'PROMO', 'PRM')   AS type_replaced,
           CAST(contains(p_name, 'a') AS INT) AS has_a
    FROM part
    WHERE p_type LIKE '%O%'
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("%O%"))
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("PROMO"), F.lit("PRM")).alias("type_replaced"),
        F.col("p_name").contains("a").cast("int").alias("has_a"),
    )


# --- date/time functions ---
@query(
    "orders_by_month",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)  AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
    ).agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT)   AS qtr
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → subtract 1.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    )
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate"), 90), "yyyy-MM-dd").alias("due_date"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
    )


# --- math functions ---
@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 4)              AS qty_sqrt,
           round(ln(l_extendedprice), 4)           AS price_ln,
           round(pow(1 + l_discount, 2), 6)        AS disc_sq,
           round(abs(l_quantity - 25), 2)          AS qty_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           l_orderkey % 7                          AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.round(F.abs(F.col("l_quantity") - 25), 2).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# --- conditional expressions / pivot-style conditional aggregation ---
@query(
    "conditional_agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
           count(*) FILTER (WHERE l_linestatus = 'F') AS n_filled,
           sum(CASE WHEN l_discount > 0.05 THEN {oracle_units('l_extendedprice', 100)} ELSE 0 END) / 100.0 AS high_disc_price,
           {oracle_exact_avg(
               f"sum(CASE WHEN l_quantity >= 25 THEN {oracle_units('l_extendedprice', 100)} END)",
               "count(*) FILTER (WHERE l_quantity >= 25)", 100, 10000)} AS avg_bulk_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") >= 25
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("n_filled"),
        (
            F.sum(
                F.when(F.col("l_discount") > 0.05, to_units("l_extendedprice", 100)).otherwise(0)
            )
            / 100.0
        ).alias("high_disc_price"),
        exact_avg(
            F.sum(F.when(bulk, to_units("l_extendedprice", 100))),
            F.count(F.when(bulk, 1)),
            100,
            10000,
        ).alias("avg_bulk_price"),
    )


# --- scalar subquery / correlated aggregate via join ---
@query(
    "above_avg_balance_customers",
    oracle=f"""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE {oracle_units('c_acctbal', 100)} * (SELECT count(*) FROM customer)
          > (SELECT sum({oracle_units('c_acctbal', 100)}) FROM customer)
    """,
)
def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar subquery is a 1-row broadcast cross join — Catalyst
    # computes the aggregate once and broadcasts it. The comparison
    # `bal > avg` is done as the integer inequality bal_units * n >
    # sum_units: exact, so a balance lying ULPs from the average can't
    # flip set membership between engines.
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "_bal_u", to_units("c_acctbal", 100)
    )
    stats = cust.agg(F.sum("_bal_u").alias("_sum_u"), F.count("*").alias("_n"))
    return (
        cust.crossJoin(F.broadcast(stats))
        .filter(F.col("_bal_u") * F.col("_n") > F.col("_sum_u"))
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# --- CASE-heavy projection (expression coverage) ---
@query(
    "case_when_tiers",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'platinum'
                WHEN o_totalprice >= 150000 THEN 'gold'
                WHEN o_totalprice >=  50000 THEN 'silver'
                ELSE 'bronze' END AS tier,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_normalized
    FROM orders
    """,
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "platinum")
        .when(F.col("o_totalprice") >= 150000, "gold")
        .when(F.col("o_totalprice") >= 50000, "silver")
        .otherwise("bronze")
    )
    return orders.select(
        "o_orderkey",
        tier.alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_normalized"
        ),
    )


# --- TPC-H Q10: returned-item revenue report ---
@query(
    "q10_returned_item_report",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_REV_SQL} AS revenue
    FROM customer c
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in a half-year
    (TPC-H Q10 shape).

    Plan: lineitem filtered on returnflag at the scan (pushed), joins
    orders (fact-fact, shuffle on orderkey with the date filter
    pushed below), then customer; nation broadcasts. The final top-20
    is a TakeOrdered over the aggregated (small) result — no global
    sort of the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_units()).alias("_rev_u"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("_rev_u") / 10000.0).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q12: late-shipment priority split (conditional agg) ---
@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late shipments (>60 days after order) split by priority class
    per ship month — TPC-H Q12's shape with the priority CASE split,
    on this schema's columns.

    The lateness predicate is a theta condition between the two join
    sides, so it CANNOT push below the join; the only scan-level
    pushdown is non-null pruning. The plan is one shuffle join on
    orderkey and one partial+final conditional agg — both CASE sums
    travel in the same aggregation pass, not two query passes.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q14: promo revenue share (exact ratio of two sums) ---
@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT {oracle_exact_ratio(
        f"sum(CASE WHEN p_type = 'PROMO' THEN {oracle_units('l_extendedprice * (1 - l_discount)', 10000)} ELSE 0 END) * 100",
        f"sum({oracle_units('l_extendedprice * (1 - l_discount)', 10000)})",
    )} AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMO parts' share of March-1997 revenue, percent (Q14).

    Ratio of two sums from ONE aggregation pass over the joined
    fact slice; both sums are exact fixed-point ints so the final
    division is the only float op (floor-scaled — see
    functions/numeric.py). The part side carries only (partkey,
    type) after pruning and broadcasts; lineitem never shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_u = _rev_units()
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_u).otherwise(F.lit(0))).alias("_promo_u"),
            F.sum(rev_u).alias("_all_u"),
        )
    )
    return agg.select(
        exact_ratio(F.col("_promo_u") * 100, F.col("_all_u")).alias("promo_revenue_pct")
    )


# --- TPC-H Q16: distinct-supplier count with NOT IN exclusion ---
@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (5, 10, 15, 20)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, size) for selected non-promo
    parts, excluding complaint-list suppliers (Q16's NOT IN shape;
    the exclusion list is negative-balance suppliers on this schema).

    NOT IN over a non-nullable key plans as a broadcast anti join of
    a tiny pre-filtered dimension; count(DISTINCT) expands to the
    two-level aggregation (dedupe on full key, then count) — both
    levels partial+final, no collect-based distinct.
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(5, 10, 15, 20)
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
