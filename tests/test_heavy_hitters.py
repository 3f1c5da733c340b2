"""Heavy hitters: oracle parity covers the registered query; these
tests pin the candidate-superset guarantee on a planted adversarial
distribution with far more distinct keys than MG counters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.heavy_hitters import (
    heavy_hitters,
    misra_gries_candidates,
)


def _planted(spark):
    # 4000 distinct cold keys (1 occurrence each) + 3 hot keys, spread
    # over 8 partitions so every partition's MG runs with pressure.
    cold = spark.range(4000).select(
        F.concat(F.lit("cold_"), F.col("id")).alias("word")
    )
    hot = (
        spark.range(900).select(F.lit("alpha").alias("word"))
        .unionAll(spark.range(600).select(F.lit("beta").alias("word")))
        .unionAll(spark.range(220).select(F.lit("gamma").alias("word")))
    )
    return cold.unionAll(hot).repartition(8)


def test_heavy_hitters_exact_on_planted_zipf(spark):
    words = _planted(spark)
    # total = 4000 + 1720 = 5720; phi = 1/25 => threshold 228.8.
    # alpha (900) and beta (600) qualify; gamma (220) and every cold
    # key must be excluded even if the sketch surfaced them.
    got = {r["word"]: r["n_word"] for r in
           heavy_hitters(words, inv_phi=25, k=64).collect()}
    assert got == {"alpha": 900, "beta": 600}


def test_candidates_are_bounded_and_cover_heavies(spark):
    words = _planted(spark)
    cand = [r["word"] for r in misra_gries_candidates(words, k=64).collect()]
    assert {"alpha", "beta"} <= set(cand)
    # <= k per partition x 8 partitions.
    assert len(cand) <= 64 * 8


def test_k_below_inv_phi_rejected(spark):
    try:
        heavy_hitters(_planted(spark), inv_phi=100, k=50)
    except ValueError:
        return
    raise AssertionError("expected ValueError for k < inv_phi")


from hypothesis import given, settings, strategies as st

from tests.fuzzbudget import examples


@settings(max_examples=examples(15), deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=60),  # key id
                  st.integers(min_value=1, max_value=40)),  # multiplicity
        min_size=1, max_size=40,
    ),
    inv_phi=st.sampled_from([5, 10, 20]),
    n_parts=st.sampled_from([1, 3, 7]),
)
def test_heavy_hitters_exact_under_random_distributions(
    spark, data, inv_phi, n_parts
):
    """For any multiset, partitioning, and φ, the two-phase operator
    equals the unbounded-memory definition exactly."""
    from collections import Counter

    rows = [(f"k{kid}",) for kid, mult in data for _ in range(mult)]
    exact = Counter(w for (w,) in rows)
    total = sum(exact.values())
    want = {w: c for w, c in exact.items() if c * inv_phi >= total}

    words = spark.createDataFrame(rows, "word string").repartition(n_parts)
    got = {r["word"]: r["n_word"]
           for r in heavy_hitters(words, inv_phi=inv_phi, k=2 * inv_phi).collect()}
    assert got == want
