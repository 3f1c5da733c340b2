"""Bloom-prefiltered semi-join: result parity is covered by the oracle
suite (``bloom_semi_join_orders``, whose oracle is the NAIVE ``IN``
subquery); these tests pin what parity can't — the no-false-negative
guarantee, the measured false-positive rate at the default geometry,
and the broadcast shape of the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.joinprune import (
    BLOOM_J,
    BLOOM_M,
    bloom_candidate_keys,
    bloom_semi_join,
    bloom_words,
    q_bloom_semi_join_orders,
)
from mapreduce_lab_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
)


def _frames(spark, n_build=2000, n_probe=10_000):
    # Build keys 0..n_build; probe keys 0..n_probe (so exactly n_build+1
    # probes are true members, the rest exercise the FPR).
    build = spark.range(n_build + 1).select(F.col("id").alias("bk"))
    probe = spark.range(n_probe + 1).select(F.col("id").alias("_k"))
    return probe, build


def test_candidates_are_superset_with_low_fpr(spark):
    probe, build = _frames(spark)
    cand = set(
        r["_k"] for r in bloom_candidate_keys(probe, build, "bk").collect()
    )
    true = set(range(2001))
    assert true <= cand, "bloom dropped a true member (false negative)"
    fp = len(cand - true)
    n_non_members = 10_001 - 2001
    # Theoretical FPR at m=65536, j=3, n=2001 is ~0.07%; assert an
    # order-of-magnitude slack bound so hash quirks can't flake.
    assert fp / n_non_members < 0.01, f"FPR too high: {fp}/{n_non_members}"


def test_bloom_semi_join_equals_plain_semi_join(spark):
    probe, build = _frames(spark, n_build=500, n_probe=3000)
    fact = probe.select(F.col("_k").alias("fk"), (F.col("_k") * 10).alias("payload"))
    got = bloom_semi_join(fact, build, "fk", "bk")
    want = fact.join(build.select(F.col("bk").alias("fk")), "fk", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_word_table_is_fixed_size(spark):
    _, build = _frames(spark, n_build=5000)
    words = bloom_words(build, "bk")
    assert words.count() <= BLOOM_M // 32
    # Every key sets at most BLOOM_J bits; popcount over all words
    # must not exceed (and with distinct hashes approaches) J*n.
    total_bits = words.select(
        F.sum(F.expr("bit_count(bits)")).alias("n")
    ).collect()[0]["n"]
    assert 0 < total_bits <= BLOOM_J * 5001


def test_registered_query_plan_broadcasts_filter_and_survivors(spark, sf_dir):
    df = q_bloom_semi_join_orders(spark, sf_dir)
    plan = formatted_plan(df)
    # The word table, the verified-survivor set, and the nation dim all
    # ride broadcasts; the orders fact is never shuffled by key.
    assert broadcast_join_count(df) >= 3
    assert "SortMergeJoin" not in plan
