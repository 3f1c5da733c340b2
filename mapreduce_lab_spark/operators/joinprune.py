"""Bloom-prefiltered semi-join: runtime scan pruning made explicit.

Superset surface (the reference has no joins at all beyond the const
sorted-value join, plugin/sorted_value_join): the 100 TB pattern where
the build side of a semi-join is too large to broadcast as keys, but
its BLOOM FILTER is a fixed-size bitmap that ships to every scan task
and drops non-matching fact rows BEFORE the shuffle. Spark's own
runtime row-group filters (`spark.sql.optimizer.runtime.bloomFilter.*`)
and DPP do this invisibly for some plans; this operator is the
explicit, engine-portable construction, so the pruning applies to any
plan shape and the filter itself is oracle-checkable.

Construction (all JVM-side, no Python):

1. Build: each build key sets ``BLOOM_J`` bit positions
   ``hex8_int('bloom:<i>:' || key) % BLOOM_M``. Positions pack into
   32-bit words (``bit_or(1 << pos%32)`` grouped by ``pos/32``) — a
   fixed ``BLOOM_M/32``-row word table regardless of build-side row
   count. 32-bit (not 64-bit) packing because ``1 << 63`` overflows
   DuckDB's BIGINT shift while ``1 << 31`` is in-range for both
   engines.
2. Probe: each distinct probe key computes the same ``BLOOM_J``
   positions and joins the BROADCAST word table; a key survives iff
   all ``BLOOM_J`` bits are set. False positives pass (≈0.4% at the
   default geometry for ~6k keys), false negatives cannot.
3. Exact verify: the surviving candidates semi-join the true build
   keys, so the final result is EXACTLY the plain semi-join — the
   oracle is the naive independent SQL, not a replay of the bloom.

At 100 TB the word table is ~8 KB however large the build side grows
(resize BLOOM_M with build cardinality: m ≈ 10·n bits keeps FPR under
1%), the prefilter drops ~96% of fact rows at the scan, and the exact
verify join runs on the small survivor set. ``tests/test_joinprune.py``
pins the superset property (candidates ⊇ true keys), the measured
false-positive rate, and the broadcast in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int, oracle_hex8_int
from mapreduce_lab_spark.functions.numeric import exact_sum, oracle_exact_sum
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

BLOOM_M = 1 << 16  # bits in the filter
BLOOM_J = 3  # hash functions per key
_WORD_BITS = 32

BUILD_NATION = "NATION_7"  # synthetic testdata nation names are NATION_<k>


def _positions(key: Column) -> list[Column]:
    """The BLOOM_J bit positions a key sets, as columns."""
    return [
        hex8_int(F.concat(F.lit(f"bloom:{i}:"), key.cast("string"))) % BLOOM_M
        for i in range(BLOOM_J)
    ]


def bloom_words(build_keys: DataFrame, key: str) -> DataFrame:
    """The packed word table (word_idx, bits) — ≤ BLOOM_M/32 rows."""
    pos = build_keys.select(
        F.explode(F.array(*_positions(F.col(key)))).alias("pos")
    )
    return pos.groupBy((F.col("pos") / _WORD_BITS).cast("long").alias("word_idx")).agg(
        F.bit_or(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))")).alias(
            "bits"
        )
    )


def bloom_candidate_keys(probe: DataFrame, build_keys: DataFrame, build_key: str) -> DataFrame:
    """Bloom-prefilter stage alone: the probe keys (column ``_k``)
    whose BLOOM_J bits are all set in the build side's filter — a
    SUPERSET of the true matches (false positives possible, false
    negatives not; the superset property and the measured FPR are
    pinned in tests/test_joinprune.py)."""
    words = F.broadcast(bloom_words(build_keys, build_key))
    probe_pos = probe.select(
        "_k", F.posexplode(F.array(*_positions(F.col("_k")))).alias("_i", "pos")
    ).select(
        "_k",
        "_i",
        (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"CAST(pos % {_WORD_BITS} AS INT)").alias("bit"),
    )
    hits = probe_pos.join(words, "word_idx").where(
        F.expr("(shiftright(bits, bit) & 1) = 1")
    )
    return (
        hits.groupBy("_k").agg(F.count("*").alias("_nhit")).where(
            F.col("_nhit") == BLOOM_J
        ).select("_k")
    )


def bloom_semi_join(
    fact: DataFrame, build_keys: DataFrame, fact_key: str, build_key: str
) -> DataFrame:
    """``fact`` rows whose ``fact_key`` appears in ``build_keys`` —
    exact semi-join semantics, with a broadcast bloom prefilter doing
    the heavy pruning before any key shuffle."""
    probe = fact.select(F.col(fact_key).alias("_k")).distinct()
    candidates = bloom_candidate_keys(probe, build_keys, build_key)
    # Exact verify: bloom false positives die here; the result is the
    # plain semi-join, bit-for-bit.
    verified = candidates.join(
        build_keys.select(F.col(build_key).alias("_k")), "_k", "left_semi"
    )
    return fact.join(
        F.broadcast(verified.select(F.col("_k").alias(fact_key))), fact_key, "left_semi"
    )


@query(
    "bloom_semi_join_orders",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {oracle_exact_sum("o_totalprice", 100)} AS revenue
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_name = '{BUILD_NATION}'
    )
    GROUP BY o_orderpriority
    """,
)
def q_bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + revenue by priority for customers of one nation,
    with the customer-key membership test routed through the bloom
    prefilter. The oracle is the NAIVE ``IN`` subquery — the operator
    must be plan-different but result-identical."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    build = (
        customer.join(
            F.broadcast(nation.where(F.col("n_name") == BUILD_NATION)),
            customer.c_nationkey == nation.n_nationkey,
        ).select("c_custkey")
    )
    pruned = bloom_semi_join(orders, build, "o_custkey", "c_custkey")
    return pruned.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        exact_sum("o_totalprice", 100).alias("revenue"),
    )


# Re-exported for tests: the DuckDB twin of one key's bit positions.
def oracle_positions(expr: str) -> list[str]:
    return [
        f"({oracle_hex8_int(f'''('bloom:{i}:' || CAST({expr} AS STRING))''')} % {BLOOM_M})"
        for i in range(BLOOM_J)
    ]
