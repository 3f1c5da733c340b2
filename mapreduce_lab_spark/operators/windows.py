"""Window functions — ranking, offsets, running frames.

ABSENT in the reference (SURVEY.md §2.3); first-class here. Every
window is partitioned by a key (never an unpartitioned global
window — a single-partition window cannot scale) and ordered with an
explicit unique tie-breaker so results are deterministic across
engines and shuffle orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


@query(
    "window_top_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             round(o_totalprice, 2) AS totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@query(
    "window_rank_dense_percent",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           -- percent_rank recomputed in exact integer arithmetic:
           -- (rank-1)/(n-1) can land exactly on rounding boundaries
           CASE WHEN count(*) OVER (PARTITION BY p_brand) > 1
                THEN floor((rank() OVER w - 1) * 1000000 / (count(*) OVER (PARTITION BY p_brand) - 1)) / 1000000.0
                ELSE 0.0 END AS prnk
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
)
def window_rank_dense_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    n = F.count("*").over(Window.partitionBy("p_brand"))
    rnk = F.rank().over(w)
    return part.select(
        "p_brand",
        "p_partkey",
        rnk.alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.when(n > 1, F.floor((rnk - 1) * F.lit(1000000) / (n - 1)) / 1000000.0)
        .otherwise(0.0)
        .alias("prnk"),
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running sums need a total order WITHIN the partition; (shipdate,
    # orderkey, linenumber) is unique per supplier so the prefix sums
    # are reproducible. Floating-point prefix sums are order-defined,
    # hence exactly comparable once the order is pinned.
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
    )


@query(
    "window_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(date_diff('day',
                lag(o_orderdate) OVER w,
                o_orderdate) AS INT) AS days_since_prev,
           CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_moving_average",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber,
           round(avg(l_quantity) OVER (
             PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS qty_ma3
    FROM lineitem
    WHERE l_partkey <= 20
    """,
)
def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 20)
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, Window.currentRow)
    )
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 4).alias("qty_ma3"),
    )


@query(
    "window_ntile_share",
    oracle=f"""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile,
           {oracle_exact_ratio(oracle_units('c_acctbal', 100),
                               f"sum({oracle_units('c_acctbal', 100)}) OVER (PARTITION BY c_nationkey)")}
             AS nation_share
    FROM customer
    """,
)
def window_ntile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ntile over a global ORDER BY is the one legitimately global
    # window here (quartiles are global by definition); the share
    # column stays partitioned by nation. For 100 TB quantiles use
    # approxQuantile / percentile_approx instead (see textstats).
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "_bal_u", to_units("c_acctbal", 100)
    )
    w_global = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    w_nation = Window.partitionBy("c_nationkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w_global).alias("quartile"),
        exact_ratio(F.col("_bal_u"), F.sum("_bal_u").over(w_nation)).alias("nation_share"),
    )
