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

# Range partitions for the distributed global-rank composition in
# window_ntile_share. At 100 TB this scales with the cluster; the
# per-partition sort stays in memory as long as n/P rows fit a task.
NTILE_RANGE_PARTITIONS = 32


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
    """Global quartile by balance + share of nation's balance.

    ``ntile(4) OVER (ORDER BY ...)`` — the oracle's formulation — is a
    GLOBAL window: Spark plans it as Exchange SinglePartition + one
    task sorting the entire table, a guaranteed stall at 100 TB. This
    implementation reproduces ntile's exact bucket semantics with the
    classic distributed ranking composition instead:

    1. ``repartitionByRange`` on the sort key — each partition holds a
       contiguous key range, partition ids follow the global order;
    2. ``row_number`` WITHIN each range partition (parallel sort);
    3. per-partition row counts (a P-row metadata collect, not a data
       collect) give each partition's global rank offset;
    4. global_rank = offset + local_rank, and ntile(4)'s bucket is a
       closed-form expression of (global_rank, n).

    The ranked frame is cached so the count job and the output job see
    identical range boundaries (at scale: persist the ranked
    intermediate). tests/test_plan_quality.py pins the absence of a
    single-partition Window over customer.
    """
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "_bal_u", to_units("c_acctbal", 100)
    )
    ranked = (
        cust.repartitionByRange(NTILE_RANGE_PARTITIONS, F.desc("c_acctbal"), F.asc("c_custkey"))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(F.desc("c_acctbal"), "c_custkey")
            ),
        )
        .cache()
    )
    sizes = {r["_pid"]: r["cnt"] for r in ranked.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, total = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, total))
        total += sizes[pid]
    off = spark.createDataFrame(offsets, "_pid int, _off long")

    # ntile(4) closed form: with n = total rows, q = n div 4 and
    # rem = n mod 4, the first `rem` buckets hold q+1 rows, the rest q.
    q, rem = divmod(total, 4)
    r = F.col("_off") + F.col("_lr")
    if q == 0:  # fewer rows than buckets: bucket i = row i
        quartile = r.cast("int")
    else:
        quartile = (
            F.when(r <= rem * (q + 1), F.ceil(r / (q + 1)))
            .otherwise(rem + F.ceil((r - rem * (q + 1)) / q))
            .cast("int")
        )
    w_nation = Window.partitionBy("c_nationkey")
    return ranked.join(F.broadcast(off), "_pid").select(
        "c_custkey",
        quartile.alias("quartile"),
        exact_ratio(F.col("_bal_u"), F.sum("_bal_u").over(w_nation)).alias("nation_share"),
    )


@query(
    "window_range_30d_revenue",
    oracle=f"""
    -- RANGE frame over integer day numbers: peers (same customer,
    -- same day) aggregate together regardless of row order — the
    -- frame semantics rows-frames can't express. Integer ordering
    -- keys keep the frame boundaries engine-exact.
    SELECT o_custkey, o_orderkey,
           date_diff('day', DATE '1992-01-01', o_orderdate) AS day_num,
           (CAST(sum({oracle_units('o_totalprice', 100)}) OVER (
                PARTITION BY o_custkey
                ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
                RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100)
             AS rev_30d
    FROM orders
    """,
)
def window_range_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per customer via a RANGE frame.

    The ordering key is an integer day number, so `rangeBetween(-29, 0)`
    is a value-based frame (all orders in the trailing 30 days,
    including same-day peers) — deterministic under intra-day ties
    where a rows-frame would not be. Partitioned by customer: high
    cardinality, no global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.alias("day_num"))
        .rangeBetween(-29, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day.alias("day_num"),
        (F.sum(to_units("o_totalprice", 100)).over(w).cast("double") / F.lit(100)).alias(
            "rev_30d"
        ),
    )


# --- IGNORE NULLS frame navigation (shared SQL) ---------------------------

# Sparse column manufactured with CASE (only 'F'-status orders carry
# a value); last_value ... IGNORE NULLS forward-fills it along each
# customer's order history — the classic LOCF idiom as a pure window
# (vs the spine-join LOCF in timeseries.py). The IGNORE NULLS
# modifier is the one dialect split: Spark takes it AFTER the call
# (`last_value(x) IGNORE NULLS OVER`), DuckDB INSIDE the parens
# (`last_value(x IGNORE NULLS) OVER`) — same semantics, two spellings.
_IGNORE_NULLS_TEMPLATE = """
SELECT o_orderkey, o_custkey,
       {lv} OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_price,
       CASE WHEN filled_price IS NULL THEN 1 ELSE 0 END AS was_filled
FROM (
    SELECT o_orderkey, o_custkey, o_orderdate,
           CASE WHEN o_orderstatus = 'F' THEN round(o_totalprice, 2) END
             AS filled_price
    FROM orders
) src
"""

_IGNORE_NULLS_SQL = _IGNORE_NULLS_TEMPLATE.format(
    lv="last_value(filled_price) IGNORE NULLS"
)
_IGNORE_NULLS_ORACLE = _IGNORE_NULLS_TEMPLATE.format(
    lv="last_value(filled_price IGNORE NULLS)"
)


@query("window_ignore_nulls_locf", oracle=_IGNORE_NULLS_ORACLE)
def q_window_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via ``last_value ... IGNORE NULLS`` over each
    customer's order history — the window-native LOCF.

    Scale shape: partitioned by o_custkey (high cardinality), ordered
    within partition — a single hash shuffle plus per-partition sort,
    no spine join, no global window. The frame is
    UNBOUNDED PRECEDING..CURRENT ROW, which Spark evaluates in one
    running pass (no per-row re-scan). IGNORE NULLS navigation is the
    dialect corner this probes: both engines must skip nulls, not
    propagate them.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_IGNORE_NULLS_SQL)
