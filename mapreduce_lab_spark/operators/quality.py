"""Data-quality and data-integrity operators: expectation suites,
snapshot diffing (CDC), and order-independent table fingerprints.

A 100 TB lake needs gatekeeping before training pipelines consume a
drop: constraint suites (a Deequ-style expectations pass), change
detection between snapshot versions, and cheap whole-table checksums
that prove two copies are identical without moving either. The
reference has no quality surface at all (its contract is "the output
file matches mrsequential", ``test.sh:70-107``) — this family is the
engine-native generalization of that differential check.

Scale shapes, by operator:

- ``dq_expectations_orders``: ALL single-table constraints ride ONE
  map-side-combinable aggregate pass (one scan, one 1-row result);
  the referential-integrity check is the only join and it aggregates
  the fact side down to distinct keys before the anti-join. Adding a
  constraint adds a column to the agg, not a job.
- ``snapshot_diff_orders``: the full-outer join shuffles only
  ``(key, 60-bit row hash)`` — never row payloads — so diffing two
  100 TB snapshots moves ~16 bytes/row. Co-partitioning both sides
  on the join key is the bucketed-table fast path.
- ``table_fingerprints``: per-row md5 → 60-bit int, combined with
  the commutative/associative ``bit_xor`` aggregate: order- and
  partitioning-independent, no overflow at any row count (unlike an
  integer sum, which wraps int64 in Spark but promotes to HUGEINT in
  DuckDB — an engine divergence this operator must avoid since the
  whole point is cross-engine agreement). One narrow scan per table,
  one 1-row result, zero shuffle beyond the final partial merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import (
    exact_ratio,
    oracle_exact_ratio,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Expectations suite


def dq_expectations(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """One-pass constraint suite over ``orders`` (+ FK check vs
    ``customer``): long-form (constraint, metric, passed) rows."""
    agg = orders.agg(
        F.count("*").alias("n"),
        F.count_distinct("o_orderkey").alias("n_key"),
        F.count("o_custkey").alias("n_cust"),
        F.sum(F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias(
            "n_domain"
        ),
        F.min(to_units("o_totalprice", 100)).alias("min_price_u"),
    )
    orphans = (
        orders.select("o_custkey")
        .distinct()
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("n_orphan"))
    )
    scalars = agg.crossJoin(F.broadcast(orphans))
    n = F.col("n").cast("double")
    checks = F.array(
        F.struct(
            F.lit("row_count_positive").alias("constraint"),
            F.col("n").cast("double").alias("metric"),
            (F.col("n") > 0).alias("passed"),
        ),
        F.struct(
            F.lit("unique_o_orderkey").alias("constraint"),
            (F.col("n_key").cast("double") / n).alias("metric"),
            (F.col("n_key") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit("complete_o_custkey").alias("constraint"),
            (F.col("n_cust").cast("double") / n).alias("metric"),
            (F.col("n_cust") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit("domain_o_orderstatus").alias("constraint"),
            (F.col("n_domain").cast("double") / n).alias("metric"),
            (F.col("n_domain") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit("nonneg_o_totalprice").alias("constraint"),
            (F.col("min_price_u").cast("double") / F.lit(100)).alias("metric"),
            (F.col("min_price_u") >= 0).alias("passed"),
        ),
        F.struct(
            F.lit("fk_o_custkey_customer").alias("constraint"),
            F.col("n_orphan").cast("double").alias("metric"),
            (F.col("n_orphan") == 0).alias("passed"),
        ),
    )
    return scalars.select(F.explode(checks).alias("c")).select(
        "c.constraint", "c.metric", "c.passed"
    )


_DQ_ORACLE = f"""
WITH agg AS (
    SELECT count(*) AS n,
           count(DISTINCT o_orderkey) AS n_key,
           count(o_custkey) AS n_cust,
           sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS n_domain,
           min({oracle_units('o_totalprice', 100)}) AS min_price_u
    FROM orders
),
orph AS (
    SELECT count(*) AS n_orphan FROM (
        SELECT DISTINCT o_custkey FROM orders
    ) o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
    )
),
s AS (SELECT * FROM agg, orph)
SELECT 'row_count_positive' AS constraint, CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM s
UNION ALL
SELECT 'unique_o_orderkey', CAST(n_key AS DOUBLE) / CAST(n AS DOUBLE), n_key = n FROM s
UNION ALL
SELECT 'complete_o_custkey', CAST(n_cust AS DOUBLE) / CAST(n AS DOUBLE), n_cust = n FROM s
UNION ALL
SELECT 'domain_o_orderstatus', CAST(n_domain AS DOUBLE) / CAST(n AS DOUBLE), n_domain = n FROM s
UNION ALL
SELECT 'nonneg_o_totalprice', CAST(min_price_u AS DOUBLE) / 100, min_price_u >= 0 FROM s
UNION ALL
SELECT 'fk_o_custkey_customer', CAST(n_orphan AS DOUBLE), n_orphan = 0 FROM s
"""


@query("dq_expectations_orders", oracle=_DQ_ORACLE)
def q_dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_expectations(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC)
#
# Two snapshot versions are derived deterministically from orders so
# the oracle sees the identical inputs:
#   old = rows with o_orderkey % 4 != 0
#   new = rows with o_orderkey % 4 != 1, price +$1.00 where key % 7 == 0
# so keys ≡ 1 (mod 4) are deletes, keys ≡ 0 (mod 4) are inserts, and
# within the intersection every key ≡ 0 (mod 7) is an update.


def _row_hash(price_u, status):
    """60-bit engine-portable hash of the compared columns."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", price_u.cast("string"), status)), 1, 15),
        16,
        10,
    ).cast("long")


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Classify keys as insert/delete/update between two snapshots.

    Both inputs must already be projected to (key, row_hash): the
    join — the only shuffle — moves 16 bytes per row regardless of
    snapshot width.
    """
    o = old.select(F.col(key), F.col("row_hash").alias("h_old"))
    n = new.select(F.col(key), F.col("row_hash").alias("h_new"))
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), F.lit("insert"))
        .when(F.col("h_new").isNull(), F.lit("delete"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("update"))
    )
    return (
        joined.select(F.col(key), change.alias("change_type"))
        .where(F.col("change_type").isNotNull())
    )


_DIFF_ORACLE = f"""
WITH old AS (
    SELECT o_orderkey,
           ('0x' || substr(md5(concat_ws('|',
                CAST({oracle_units('o_totalprice', 100)} AS VARCHAR),
                o_orderstatus)), 1, 15))::BIGINT AS row_hash
    FROM orders WHERE o_orderkey % 4 != 0
),
new AS (
    SELECT o_orderkey,
           ('0x' || substr(md5(concat_ws('|',
                CAST({oracle_units('o_totalprice', 100)}
                     + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS VARCHAR),
                o_orderstatus)), 1, 15))::BIGINT AS row_hash
    FROM orders WHERE o_orderkey % 4 != 1
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN o.row_hash != n.row_hash THEN 'update' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE CASE WHEN o.o_orderkey IS NULL THEN 'insert'
           WHEN n.o_orderkey IS NULL THEN 'delete'
           WHEN o.row_hash != n.row_hash THEN 'update' END IS NOT NULL
"""


@query("snapshot_diff_orders", oracle=_DIFF_ORACLE)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price_u = to_units("o_totalprice", 100)
    old = orders.where(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", _row_hash(price_u, F.col("o_orderstatus")).alias("row_hash")
    )
    new_price_u = price_u + F.when(F.col("o_orderkey") % 7 == 0, 100).otherwise(0)
    new = orders.where(F.col("o_orderkey") % 4 != 1).select(
        "o_orderkey", _row_hash(new_price_u, F.col("o_orderstatus")).alias("row_hash")
    )
    return snapshot_diff(old, new, "o_orderkey")


# ---------------------------------------------------------------------------
# Table fingerprints


def _fingerprint(df: DataFrame, name: str, canonical) -> DataFrame:
    """(table, n_rows, fingerprint): bit_xor of 60-bit row hashes."""
    h = F.conv(F.substring(F.md5(canonical), 1, 15), 16, 10).cast("long")
    return (
        df.select(h.alias("_h"))
        .agg(F.count("*").alias("n_rows"), F.bit_xor("_h").alias("fingerprint"))
        .select(F.lit(name).alias("table_name"), "n_rows", "fingerprint")
    )


_FP_ORACLE = f"""
SELECT 'orders' AS table_name, count(*) AS n_rows,
       bit_xor(('0x' || substr(md5(concat_ws('|',
           CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
           CAST({oracle_units('o_totalprice', 100)} AS VARCHAR),
           strftime(o_orderdate, '%Y-%m-%d'),
           o_orderstatus, o_orderpriority)), 1, 15))::BIGINT) AS fingerprint
FROM orders
UNION ALL
SELECT 'customer', count(*),
       bit_xor(('0x' || substr(md5(concat_ws('|',
           CAST(c_custkey AS VARCHAR), c_name, CAST(c_nationkey AS VARCHAR),
           CAST({oracle_units('c_acctbal', 100)} AS VARCHAR),
           c_mktsegment)), 1, 15))::BIGINT)
FROM customer
UNION ALL
SELECT 'part', count(*),
       bit_xor(('0x' || substr(md5(concat_ws('|',
           CAST(p_partkey AS VARCHAR), p_name, p_brand, p_type,
           CAST(p_size AS VARCHAR),
           CAST({oracle_units('p_retailprice', 100)} AS VARCHAR))), 1, 15))::BIGINT)
FROM part
"""


@query("table_fingerprints", oracle=_FP_ORACLE)
def q_table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent checksums of three tables in one result.

    Every value is canonicalized to an engine-exact string (integers,
    fixed-point units, 'yyyy-MM-dd' dates) before hashing — raw
    double→string or timestamp→string rendering differs between
    engines and would poison the checksum.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    fp_orders = _fingerprint(
        orders,
        "orders",
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            to_units("o_totalprice", 100).cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        ),
    )
    fp_customer = _fingerprint(
        customer,
        "customer",
        F.concat_ws(
            "|",
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_nationkey").cast("string"),
            to_units("c_acctbal", 100).cast("string"),
            F.col("c_mktsegment"),
        ),
    )
    fp_part = _fingerprint(
        part,
        "part",
        F.concat_ws(
            "|",
            F.col("p_partkey").cast("string"),
            F.col("p_name"),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size").cast("string"),
            to_units("p_retailprice", 100).cast("string"),
        ),
    )
    return fp_orders.unionByName(fp_customer).unionByName(fp_part)


# ---------------------------------------------------------------------------
# CDC apply (batch MERGE)


def cdc_apply(snapshot: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply insert/update/delete change rows to a snapshot — the batch
    MERGE INTO. Survivors are the snapshot minus touched keys (one
    anti join, the only shuffle of snapshot data, and Catalyst/AQE
    broadcasts the touched-key side when the change batch is small —
    the common CDC shape); upserted payloads union in shuffle-free.
    The inverse of ``snapshot_diff``: applying a diff to the old
    snapshot must reproduce the new one exactly, which is what the
    registered query's oracle asserts end-to-end.
    """
    touched = changes.where(
        F.col("change_type").isin("delete", "update")
    ).select(key)
    survivors = snapshot.join(touched, key, "left_anti")
    upserts = changes.where(
        F.col("change_type").isin("insert", "update")
    ).drop("change_type")
    return survivors.unionByName(upserts)


@query(
    "cdc_apply_orders",
    # The expected result of applying the change stream to the old
    # snapshot is, by construction, exactly the new snapshot — so the
    # oracle is the direct definition of "new", making the MERGE
    # correctness audit trivial to read.
    oracle=f"""
    SELECT o_orderkey,
           (CAST({oracle_units('o_totalprice', 100)}
                 + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS DOUBLE)
            / 100) AS price,
           o_orderstatus
    FROM orders WHERE o_orderkey % 4 != 1
    """,
)
def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """old snapshot (keys % 4 != 0) + change rows (inserts: keys % 4 == 0;
    deletes: keys % 4 == 1; updates: +$1.00 where key % 7 == 0) — the
    same deterministic derivation as snapshot_diff_orders."""
    orders = load_table(spark, sf_dir, "orders")
    price_u = to_units("o_totalprice", 100)
    new_price_u = price_u + F.when(F.col("o_orderkey") % 7 == 0, 100).otherwise(0)
    price = price_u.cast("double") / F.lit(100)
    new_price = new_price_u.cast("double") / F.lit(100)

    old = orders.where(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", price.alias("price"), "o_orderstatus"
    )
    inserts = orders.where(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey",
        F.lit("insert").alias("change_type"),
        new_price.alias("price"),
        "o_orderstatus",
    )
    deletes = orders.where(F.col("o_orderkey") % 4 == 1).select(
        "o_orderkey",
        F.lit("delete").alias("change_type"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    )
    updates = (
        orders.where((F.col("o_orderkey") % 4).isin(2, 3) & (F.col("o_orderkey") % 7 == 0))
        .select(
            "o_orderkey",
            F.lit("update").alias("change_type"),
            new_price.alias("price"),
            "o_orderstatus",
        )
    )
    changes = inserts.unionByName(deletes).unionByName(updates)
    return cdc_apply(old, changes, "o_orderkey")


# --- referential-integrity audit ------------------------------------------

_FK_EDGES = [
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit of every foreign-key edge in the star schema: per
    edge, child row count, orphan rows (child key with no parent), and
    null child keys — the pre-flight every warehouse load runs before
    trusting joins.

    Scale shape per edge: one anti-join of the child against the
    (dimension-sized, broadcastable) parent KEY COLUMN plus two
    counts; all seven edges union into one tidy report. Nothing
    shuffles the child tables by key — the parent key sets broadcast.
    A zero-orphan report is also the precondition the TPC-H queries'
    inner joins silently assume; this makes the assumption checkable.
    """
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("_pk"))
        orphans = (
            c.where(F.col(ck).isNotNull())
            .join(F.broadcast(p), F.col(ck) == F.col("_pk"), "left_anti")
            .agg(F.count("*").alias("n"))
        )
        summary = c.agg(
            F.count("*").alias("n_child"),
            F.count(F.when(F.col(ck).isNull(), 1)).alias("n_null_keys"),
        )
        parts.append(
            summary.join(F.broadcast(orphans)).select(
                F.lit(f"{child}.{ck} -> {parent}.{pk}").alias("fk_edge"),
                "n_child",
                F.col("n").alias("n_orphans"),
                "n_null_keys",
            )
        )
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionByName(frame)
    return out


_FK_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{child}.{ck} -> {parent}.{pk}' AS fk_edge,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT count(*) FROM {child} c
         WHERE c.{ck} IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}))
           AS n_orphans,
       (SELECT count(*) FROM {child} WHERE {ck} IS NULL) AS n_null_keys"""
    for child, ck, parent, pk in _FK_EDGES
)


@query("fk_integrity_audit", oracle=_FK_SQL)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per star-schema FK edge: child rows, orphans, null keys."""
    return fk_integrity_audit(spark, sf_dir)


# --- Benford first-digit census ----------------------------------------------

# Benford's law (Newcomb 1881 / Benford 1938, public): naturally-
# occurring multi-order-of-magnitude amounts have first significant
# digit d with probability log10(1 + 1/d). Fabricated or truncated
# data deviates — the classic forensic screen on a financial column,
# run here over o_totalprice. The digit is extracted from the STRING
# of the exact integer cents (substr of an int64's decimal rendering
# is engine-identical), never via float log10, whose behavior at
# exact powers of ten differs in the last ulp between libm builds.
# Expected shares are Python-computed literals inlined into BOTH
# engines, so the comparison column is bit-identical by construction.

import math as _math

BENFORD_EXPECTED = {str(d): _math.log10(1 + 1 / d) for d in range(1, 10)}


def benford_digit_census(orders: DataFrame) -> DataFrame:
    """Per first significant digit 1-9: order count, observed share,
    Benford-expected share, and the absolute gap — one map-side
    combinable pass, census over the 9-row frame."""
    pu = to_units(F.col("o_totalprice"), 100)
    digit = F.substring(pu.cast("string"), 1, 1)
    census = (
        orders.where(pu > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    expected = None
    for d, p in BENFORD_EXPECTED.items():
        cond, v = F.col("digit") == d, F.lit(p)
        expected = F.when(cond, v) if expected is None else expected.when(cond, v)
    share = exact_ratio(F.col("n_orders"), total)
    return census.select(
        "digit",
        "n_orders",
        share.alias("share"),
        expected.alias("expected_share"),
        F.abs(share - expected).alias("abs_gap"),
    )


_BENFORD_CASE = " ".join(
    f"WHEN '{d}' THEN {p!r}" for d, p in BENFORD_EXPECTED.items()
)

_BENFORD_ORACLE = f"""
WITH census AS (
  SELECT substr(CAST({oracle_units('o_totalprice', 100)} AS VARCHAR), 1, 1)
             AS digit,
         count(*) AS n_orders
  FROM orders
  WHERE {oracle_units('o_totalprice', 100)} > 0
  GROUP BY 1
)
SELECT digit, n_orders,
       {oracle_exact_ratio("n_orders", "sum(n_orders) OVER ()")} AS share,
       CASE digit {_BENFORD_CASE} END AS expected_share,
       abs({oracle_exact_ratio("n_orders", "sum(n_orders) OVER ()")}
           - CASE digit {_BENFORD_CASE} END) AS abs_gap
FROM census
"""


@query("benford_digit_census", oracle=_BENFORD_ORACLE)
def q_benford_digit_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_digit_census(load_table(spark, sf_dir, "orders"))


# --- delete-propagation census (right-to-be-forgotten sizing) -----------------

# GDPR/CCPA erasure and training-data takedowns hit a warehouse as a
# CASCADE: deleting a customer set must also delete their orders and
# those orders' line items. Before running the (expensive, compacting)
# delete, every governed lake SIZES it — per table: rows to erase and
# the fraction of the table they are — because the answer decides
# between delete-vector tombstones and full-file rewrites.
#
# The census walks the FK chain with semi joins only (the delete-key
# sets stream; no row payload ever shuffles): customer sample ->
# orders by o_custkey -> lineitem by l_orderkey. The sample is the
# deterministic c_custkey % 97 == 0 slice (a stand-in for the real
# deletion-request manifest). One row per affected table, fully
# oracled.

DELETE_SAMPLE_MOD = 97


def delete_propagation_census(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    doomed_c = customer.where(
        F.col("c_custkey") % DELETE_SAMPLE_MOD == 0
    ).select("c_custkey")
    doomed_o = orders.join(
        doomed_c.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        "left_semi",
    )
    doomed_l = lineitem.join(
        doomed_o.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )

    def leg(tag: str, doomed: DataFrame, full: DataFrame) -> DataFrame:
        d = doomed.agg(F.count(F.lit(1)).alias("rows_to_delete"))
        t = full.agg(F.count(F.lit(1)).alias("table_rows"))
        return d.crossJoin(F.broadcast(t)).select(
            F.lit(tag).alias("table_name"),
            "rows_to_delete",
            "table_rows",
            exact_ratio(F.col("rows_to_delete"), F.greatest(F.col("table_rows"), F.lit(1))).alias(
                "delete_fraction"
            ),
        )

    return (
        leg("customer", doomed_c, customer)
        .unionByName(leg("orders", doomed_o, orders))
        .unionByName(leg("lineitem", doomed_l, lineitem))
    )


_DELETE_ORACLE = f"""
WITH dc AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {DELETE_SAMPLE_MOD} = 0
), do_ AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dc)
), dl AS (
  SELECT 1 AS x FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM do_)
)
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM dc) AS rows_to_delete,
       (SELECT count(*) FROM customer) AS table_rows,
       {oracle_exact_ratio(
           "(SELECT count(*) FROM dc)",
           "greatest((SELECT count(*) FROM customer), 1)",
       )} AS delete_fraction
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM do_),
       (SELECT count(*) FROM orders),
       {oracle_exact_ratio(
           "(SELECT count(*) FROM do_)",
           "greatest((SELECT count(*) FROM orders), 1)",
       )}
UNION ALL
SELECT 'lineitem',
       (SELECT count(*) FROM dl),
       (SELECT count(*) FROM lineitem),
       {oracle_exact_ratio(
           "(SELECT count(*) FROM dl)",
           "greatest((SELECT count(*) FROM lineitem), 1)",
       )}
"""


@query("delete_propagation_census", oracle=_DELETE_ORACLE)
def q_delete_propagation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure-cascade sizing: rows each table loses if the sampled
    customer set exercises its right to be forgotten, via semi-join
    FK walks (customer -> orders -> lineitem); per-table counts and
    delete fractions, fully oracled."""
    return delete_propagation_census(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
