"""Remaining TPC-H query shapes expressible on this schema.

The reference has no joins, subqueries, or multi-table aggregation
anywhere (SURVEY.md §2.3: Joins ABSENT, verified over all 14 Go
files); these queries complete the engine's relational superset with
the classic TPC-H plans Q6-Q9/Q11/Q13/Q15/Q18/Q19/Q22, adapted to the
columns this schema actually carries (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone — see TESTDATA.md),
with parameters re-tuned to this data's 1995-2001 date range so every
query selects a non-trivial row set at oracle scale.

Scale posture per query is noted in its docstring; shared rules:
nation/region/supplier dims are broadcast, money aggregates use exact
fixed-point units (functions/numeric.py) so Spark and DuckDB hash
identically, and every filter references scan columns directly so it
pushes into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_avg,
    oracle_exact_ratio,
    oracle_exact_sum,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

_REV_SQL = oracle_exact_sum("l_extendedprice * (1 - l_discount)", 10000)


def _rev_units():
    return to_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# --- TPC-H Q6: selective scan + single global aggregate ---
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {oracle_exact_sum('l_extendedprice * l_discount', 10000)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-efficiency query — every predicate is a
    per-row comparison on scan columns, so all four push into the
    parquet reader (PushedFilters) and the aggregate is a single
    partial+final sum with no shuffle of data rows. At 100 TB this is
    the query where min/max row-group pruning on l_shipdate does
    almost all the work.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(to_units(F.col("l_extendedprice") * F.col("l_discount"), 10000))
                / 10000.0
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --- TPC-H Q7: volume shipping between two nations ---
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_REV_SQL} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year between two nations.

    Plan shape: supplier and both nation copies broadcast (bounded
    dims), so lineitem acquires supp_nation map-side with no shuffle;
    the only wide exchange is the lineitem ⋈ orders fact-fact join.
    Filtering each side to the two target nations BEFORE that join
    (via the broadcast semi-filter) cuts the shuffled volume to the
    selected pair's rows — at 100 TB this pre-join reduction is the
    difference between shuffling 2 nations' traffic and all 25.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # Inner-join supplier/customer to the two-nation dims first: both
    # fact sides shrink to the pair's rows before the wide join.
    s = supp.join(F.broadcast(n1), supp.s_nationkey == n1.s_nk).select(
        "s_suppkey", "supp_nation"
    )
    c = cust.join(F.broadcast(n2), cust.c_nationkey == n2.c_nk).select(
        "c_custkey", "cust_nation"
    )
    o = orders.join(c, orders.o_custkey == c.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev_units()) / 10000.0).alias("revenue"))
    )


# --- TPC-H Q8: national market share within a region ---
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {oracle_exact_ratio(
               "sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_u ELSE 0 END)",
               "sum(vol_u)",
           )} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             {oracle_units('l_extendedprice * (1 - l_discount)', 10000)} AS vol_u,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) AS all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into
    ASIA, by order year.

    The share is a conditional-sum ratio over one grouped pass —
    never two scans. nation/region/supplier broadcast; the part
    filter (p_type) is applied before its join so the build side of
    the part join is pre-shrunk. Exact-unit ratio keeps both engines
    bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # customers in ASIA (broadcast nation⋈region, then broadcast the
    # resulting bounded dim onto customer)
    asia_nk = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    c = cust.join(F.broadcast(asia_nk), cust.c_nationkey == F.col("c_nk")).select(
        "c_custkey"
    )
    s = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), "n_name")),
        supp.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = orders.join(c, orders.o_custkey == c.c_custkey).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    vol = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("o_year", _rev_units().alias("vol_u"), "supp_nation")
    )
    return vol.groupBy("o_year").agg(
        exact_ratio(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_u")).otherwise(0)),
            F.sum("vol_u"),
        ).alias("mkt_share")
    )


# --- TPC-H Q13: customer order-count distribution (left outer join) ---
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed k (non-urgent) orders,
    for each k — customers with zero such orders must survive, which
    is why the join is LEFT OUTER with the priority predicate in the
    join condition (a WHERE would silently turn it inner: the classic
    outer-join filter-placement trap).

    Two aggregations, two shuffles: by custkey (co-partitioned with
    the join, so AQE coalesces them), then by the tiny c_count
    domain. The adaptation from standard Q13 (o_comment NOT LIKE) is
    the o_orderpriority predicate — this schema carries no comment
    column (TESTDATA.md).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- TPC-H Q15: top supplier(s) by quarterly revenue ---
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum({oracle_units('l_extendedprice * (1 - l_discount)', 10000)}) AS rev_u
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, (rev_u / 10000.0) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_u = (SELECT max(rev_u) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum revenue in 1996Q1.

    The view-then-max-then-filter of the spec becomes one aggregation
    plus a rank-over-empty-window... deliberately NOT: a global
    Window.orderBy would pull every supplier's total through a single
    partition. Instead the scalar max (one row) is cross-joined back
    — two passes over the tiny aggregated set, zero single-partition
    sorts. Ties are kept, matching the spec. Comparison happens on
    exact integer units so Spark and DuckDB agree on who is max.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_units()).alias("rev_u"))
    )
    mx = rev.agg(F.max("rev_u").alias("max_u"))
    return (
        rev.join(F.broadcast(mx), rev.rev_u == mx.max_u)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", (F.col("rev_u") / 10000.0).alias("total_revenue"))
    )


# --- TPC-H Q18: large-volume customers ---
@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {oracle_exact_sum('l_quantity', 100)} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum({oracle_units('l_quantity', 100)}) > 30000
    )
    GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300 units, with
    their customers.

    The HAVING subquery and the outer aggregation scan the same
    lineitem grouping by the same key — so the plan computes the
    per-order quantity sum ONCE and semi-filters on it, instead of
    the literal two-scan IN-subquery translation. The >300 survivor
    set is tiny (worst-case skew-free), so its join back to
    customer/orders broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(to_units("l_quantity", 100)).alias("qty_u"))
        .filter(F.col("qty_u") > 30000)
        .select("l_orderkey", (F.col("qty_u") / 100.0).alias("sum_qty"))
    )
    return (
        orders.join(F.broadcast(per_order), orders.o_orderkey == per_order.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


# --- TPC-H Q19: disjunctive predicate join (discounted revenue) ---
@query(
    "q19_disjunct_revenue",
    oracle=f"""
    SELECT {_REV_SQL} AS revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs mixing columns from both
    join sides.

    The equi-key (p_partkey = l_partkey) is extracted so this stays a
    broadcast HASH join with the disjunction as a post-join filter —
    writing the OR into the join condition would force a nested-loop
    plan. Single-table conjuncts derivable from the OR (p_size <= 15,
    l_quantity <= 30) are pre-applied to each side so they push into
    the scans; at 100 TB that pre-filter shrinks the probe side
    before the disjunction is ever evaluated. (Adapted: no
    l_shipmode/p_container columns in this schema.)
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size") <= 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(_rev_units()) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --- TPC-H Q22: wealthy inactive customers by nation ---
@query(
    "q22_sales_opportunity",
    oracle=f"""
    WITH thr AS (
      SELECT {oracle_exact_avg(f'sum({oracle_units("c_acctbal", 100)})', 'count(*)', 100)} AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           {oracle_exact_sum('c_acctbal', 100)} AS totacctbal
    FROM customer, thr
    WHERE c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    GROUP BY c_nationkey
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers richer than the average positive balance
    with no open ('O') orders, counted per nation.

    Three classic pieces in one plan: an uncorrelated scalar subquery
    (the average, exact-unit floor so both engines derive the same
    threshold double), a NOT EXISTS decorrelated to a left-anti join
    on the pre-filtered open-orders projection, and a final group. The
    anti join's right side is orders filtered+projected to one column
    before the exchange. (Adapted: per-nation instead of phone
    country codes — no c_phone column in this schema.)
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.floor(
                    F.sum(to_units("c_acctbal", 100))
                    * F.lit(1_000_000)
                    / (F.count("*") * F.lit(100))
                )
                / 1_000_000.0
            ).alias("avg_bal")
        )
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        cust.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(to_units("c_acctbal", 100)) / 100.0).alias("totacctbal"),
        )
    )


# --- TPC-H Q9: product-type profit by nation and year ---
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           {oracle_exact_sum(
               'l_extendedprice * (1 - l_discount)'
               ' - l_quantity * p_retailprice * 0.1', 10000)} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on red parts by supplier nation and order
    year. Adapted: no partsupp table in this schema, so supply cost is
    proxied as 10% of p_retailprice — the plan shape (5-table join
    with a LIKE-filtered part dimension, two-key aggregate) is the
    point, not the cost model.

    part is filtered by the LIKE before its join and broadcast with
    only (p_partkey, p_retailprice) projected; supplier+nation
    broadcast; lineitem ⋈ orders is the one fact-fact shuffle. The
    substring filter can't push to parquet as a range, but it prunes
    the broadcast build side to ~1/4 of part — the scan itself only
    reads 3 of part's 6 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    s = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), "n_name")),
        supp.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * 0.1
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(to_units(amount, 10000)) / 10000.0).alias("profit"))
    )


# --- TPC-H Q11: parts above a global revenue-share threshold ---
@query(
    "q11_important_parts",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey,
             sum({oracle_units('l_extendedprice * (1 - l_discount)', 10000)}) AS rev_u
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, (rev_u / 10000.0) AS revenue
    FROM pr
    WHERE rev_u > (SELECT sum(rev_u) * 0.00075 FROM pr)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's distinctive shape: HAVING against a scalar computed
    from the SAME grouped relation (parts whose revenue exceeds
    0.075% of global revenue). Adapted: revenue share per part, since
    this schema has no partsupp availqty/supplycost.

    The grouped relation is computed once and reused for both the
    per-part rows and the global scalar (self-referencing CTE → reused
    exchange in Spark; the scalar joins back as a 1-row broadcast).
    The threshold double is derived from the same exact integer sum in
    both engines, so the cut is bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(_rev_units()).alias("rev_u"))
    )
    thr = pr.agg((F.sum("rev_u") * 0.00075).alias("thr_u"))
    return (
        pr.join(F.broadcast(thr))
        .filter(F.col("rev_u") > F.col("thr_u"))
        .select("l_partkey", (F.col("rev_u") / 10000.0).alias("revenue"))
    )
