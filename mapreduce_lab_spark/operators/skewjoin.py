"""Skew-aware fact-fact join: hot-key split + salted replication.

Superset surface (absent in the reference, whose only join is the
sorted-value const join of ``plugin/sorted_value_join``): the classic
100 TB mitigation for a shuffle join whose probe side has Zipfian
keys. AQE's skew-join handling splits oversized *partitions* after
the shuffle files exist; this operator removes the hot keys from the
shuffle entirely, which also covers the case AQE cannot — a single
key too large for any one task.

Plan shape (pinned in ``tests/test_skewjoin.py``):

1. Hot-key detection: ``probe.groupBy(key).count()`` filtered to
   counts ≥ threshold. Map-side-combinable, so the detection pass
   shuffles one row per distinct key. At 100 TB you would sample
   (the detection needs only the heavy tail, which sampling finds
   with high probability); exact detection is used here so the split
   is deterministic and oracle-checkable.
2. The hot-key frame is BROADCAST (it is bounded by construction:
   at most n_probe/threshold keys) and splits both sides with a
   semi/anti join — no extra shuffle of either fact table.
3. Cold path: ordinary shuffle equi-join; AQE coalesces/splits as
   usual.
4. Hot path: probe rows get a deterministic salt in [0, S) hashed
   from row-identity columns; build rows for hot keys are replicated
   S times (``explode(sequence)``); join on (key, salt). Each hot
   key's probe rows spread over S tasks instead of one.

The union of both paths equals the plain equi-join row-for-row
(pinned by the DuckDB oracle, which computes the naive join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_sum, oracle_exact_sum
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

DEFAULT_SALTS = 8
HOT_THRESHOLD = 6  # probe rows per key at/above which a key is "hot"


def salted_skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_cols: list[str],
    n_salts: int = DEFAULT_SALTS,
    hot_threshold: int = HOT_THRESHOLD,
) -> DataFrame:
    """Inner equi-join of ``probe`` and ``build`` on ``key``, with keys
    occurring ≥ ``hot_threshold`` times in ``probe`` routed through a
    salted join. ``salt_cols`` must identify probe rows (any columns
    with per-row variation); the salt only balances work and never
    affects the result, so a non-portable fast hash is fine.
    """
    hot = (
        probe.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= F.lit(hot_threshold))
        .select(key)
    )
    probe_cold = probe.join(F.broadcast(hot), key, "left_anti")
    probe_hot = probe.join(F.broadcast(hot), key, "left_semi")
    build_hot = build.join(F.broadcast(hot), key, "left_semi")

    cold = probe_cold.join(build, key, "inner")

    salted_probe = probe_hot.withColumn(
        "_salt", F.pmod(F.hash(*salt_cols), F.lit(n_salts))
    )
    replicated_build = build_hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    hot_joined = salted_probe.join(replicated_build, [key, "_salt"], "inner").drop(
        "_salt"
    )
    return cold.unionByName(hot_joined.select(*cold.columns))


@query(
    "skew_join_priority_revenue",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {oracle_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 10000)}
               AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_skew_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem⋈orders through the skew-split join, then a rollup.

    TPC-H order keys carry up to 7 lineitems, so ``hot_threshold=6``
    exercises both paths non-trivially (some keys salted, most cold).
    The oracle is the NAIVE join — the operator must be plan-different
    but result-identical.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_skew_join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        key="o_orderkey",
        salt_cols=["o_orderkey", "l_linenumber"],
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias(
            "revenue"
        ),
    )
