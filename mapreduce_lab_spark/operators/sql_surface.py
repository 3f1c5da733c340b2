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


# --- ANSI error-safe arithmetic (try_* family) -----------------------------

# Spark 4 runs in ANSI mode by default: bare division by zero or an
# invalid cast is a runtime ERROR, and the try_* family is the
# sanctioned NULL-on-failure escape hatch. DuckDB has TRY_CAST but no
# try_divide/try_add, so the oracle reproduces the semantics with
# guards — the point of the parity check is that "NULL on failure"
# lands on the same rows with the same types.
_TRY_ORACLE = """
SELECT o_orderkey,
       CASE WHEN (o_orderkey % 7) = 0 THEN NULL
            ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 7) END AS safe_ratio,
       TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                     ELSE o_orderpriority[1:1] END AS INTEGER) AS pri_digit,
       CASE WHEN o_orderkey > 9223372036854775807 - 1000000 THEN NULL
            ELSE o_orderkey + 1000000 END AS shifted
FROM orders
"""


@query("try_functions_probe", oracle=_TRY_ORACLE)
def q_try_functions_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: try_divide on a manufactured
    zero denominator, try_cast on mixed parseable/garbage strings,
    try_add near the int64 edge. Under default ANSI mode the bare
    forms would THROW on these rows — the query proves the engine's
    documented NULL-on-failure surface row-for-row against emulated
    oracle semantics.

    Scale note: try_* are pure codegen scalar expressions — identical
    cost to the unsafe forms, no shuffle, so "safe by default" costs
    nothing at 100 TB.
    """
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice").cast("double"), F.col("o_orderkey") % 7
        ).alias("safe_ratio"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("not-a-number")).otherwise(
                F.substring("o_orderpriority", 1, 1)
            ),
            F.lit("9"),
        )
        .cast("int")
        .alias("pri_digit"),
        F.try_add(F.col("o_orderkey"), F.lit(1_000_000)).alias("shifted"),
    )


# --- GROUP BY ALL (shared SQL) --------------------------------------------

_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY ALL
"""


@query("group_by_all_rollup", oracle=_GROUP_BY_ALL_SQL)
def q_group_by_all_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the engine infers the grouping keys from the
    non-aggregate select items; one ANSI-adjacent convenience string
    accepted verbatim by both engines. Plans identically to the
    explicit GROUP BY (partial+final hash agg)."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL_SQL, "orders")


# --- null-aware NOT IN (shared SQL) ---------------------------------------

_NOT_IN_SQL = """
WITH tainted AS (
    -- building-segment customer keys, with NULLs injected for the
    -- negative-balance rows: one NULL anywhere makes NOT IN
    -- three-valued (x <> NULL is UNKNOWN, never TRUE)
    SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
    FROM customer WHERE c_mktsegment = 'BUILDING'
),
clean AS (
    SELECT c_custkey AS k FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 0
)
SELECT
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM tainted))
        AS n_vs_tainted,
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM clean))
        AS n_vs_clean,
    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM clean c WHERE c.k = o.o_custkey))
        AS n_not_exists
"""


@query("not_in_null_aware_probe", oracle=_NOT_IN_SQL)
def q_not_in_null_aware_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, pinned cross-engine as shared SQL.

    One NULL in the subquery forces ``n_vs_tainted`` to 0 (every
    comparison is UNKNOWN); the NULL-free list gives the intuitive
    count, equal to the NOT EXISTS formulation. Spark plans the
    tainted leg as a null-aware anti join (the streamed-side
    ``(key = k) OR isnull(key = k)`` BroadcastHashJoin) rather than a
    per-row subquery — the decorrelation that makes three-valued NOT
    IN viable at scale."""
    return _sql(spark, sf_dir, _NOT_IN_SQL, "customer", "orders")


# --- max_by / min_by argmax aggregates (shared SQL) -----------------------

_ARGMAX_SQL = """
SELECT o_orderpriority,
       max_by(o_orderkey,
              lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 16, '0')
              || '|' || lpad(CAST(o_orderkey AS STRING), 16, '0'))
           AS priciest_order,
       min_by(o_orderkey,
              lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 16, '0')
              || '|' || lpad(CAST(o_orderkey AS STRING), 16, '0'))
           AS cheapest_order,
       max_by(o_custkey, o_orderdate || '|' || lpad(CAST(o_orderkey AS STRING), 16, '0'))
           AS latest_customer
FROM orders
GROUP BY o_orderpriority
"""


@query("argmax_orders_probe", oracle=_ARGMAX_SQL)
def q_argmax_orders_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by argmax aggregates as shared SQL — the one-pass,
    map-side-combinable way to answer "which row attains the max"
    without a rank window. Determinism discipline (same as the
    struct-ordered OHLC open/close): ties in the raw sort value are
    engine-arbitrary, so every sort key is made TOTAL by folding in
    the unique order key via ZERO-PADDED string concatenation —
    lexicographic order on the padded cents equals numeric order for
    any non-negative amount under 10^16 cents, and unlike an integer
    composite (cents·C + key) it cannot silently lose the price
    ordering when the key space outgrows the multiplier."""
    return _sql(spark, sf_dir, _ARGMAX_SQL, "orders")


# --- bag-semantics set ops: EXCEPT ALL / INTERSECT ALL (shared SQL) -------

_BAG_SET_OPS_SQL = """
SELECT 'except_all' AS op, x AS o_orderpriority, count(*) AS n
FROM (
    SELECT o_orderpriority AS x FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000
)
GROUP BY x
UNION ALL
SELECT 'intersect_all' AS op, x, count(*) AS n
FROM (
    SELECT o_orderpriority AS x FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000
)
GROUP BY x
"""


@query("bag_set_ops_probe", oracle=_BAG_SET_OPS_SQL)
def q_bag_set_ops_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations as shared SQL: EXCEPT ALL keeps
    max(m−n, 0) copies per value and INTERSECT ALL min(m, n) — bag
    semantics the DISTINCT variants in set_ops_nations cannot express.
    Catalyst lowers both to keyed count-compare aggregations
    (replicate rows via generate), so the plan is shuffle-bounded by
    distinct values, never by row count."""
    return _sql(spark, sf_dir, _BAG_SET_OPS_SQL, "orders")


# --- ordered string aggregation: LISTAGG ... WITHIN GROUP ------------------

# ANSI SQL:2016 ordered string aggregation, new to Spark in 4.0
# (SPARK-42746). The Spark side runs real LISTAGG; the DuckDB twin is
# its string_agg(x, sep ORDER BY ...) — same ordered-concat contract.
# Determinism requires the WITHIN GROUP order to be TOTAL: ordering
# by the aggregated value alone ties on duplicates, so the probe
# orders by (priority, count) pairs that are unique per group by
# construction.

_LISTAGG_SPARK_SQL = """
SELECT o_orderstatus,
       listagg(pr, '|') WITHIN GROUP (ORDER BY pr) AS priorities,
       listagg(CAST(n AS STRING), ',') WITHIN GROUP (ORDER BY pr)
           AS counts_by_priority
FROM (
    SELECT o_orderstatus, o_orderpriority AS pr, count(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
)
GROUP BY o_orderstatus
"""

_LISTAGG_ORACLE = """
SELECT o_orderstatus,
       string_agg(pr, '|' ORDER BY pr) AS priorities,
       string_agg(CAST(n AS VARCHAR), ',' ORDER BY pr)
           AS counts_by_priority
FROM (
    SELECT o_orderstatus, o_orderpriority AS pr, count(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
)
GROUP BY o_orderstatus
"""


@query("listagg_ordered_probe", oracle=_LISTAGG_ORACLE)
def q_listagg_ordered_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG over the (status, priority) count grid: the
    concatenation order is part of the hash gate, so a nondeterministic
    collect order (the classic listagg pitfall) fails correctness, not
    just style. Group sizes are bounded by the priority domain — the
    only safe cardinality class for string aggregation at 100 TB."""
    return _sql(spark, sf_dir, _LISTAGG_SPARK_SQL, "orders")
