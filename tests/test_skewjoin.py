"""Skew-split join: result parity is covered by the oracle suite
(``skew_join_priority_revenue``); these tests pin what parity can't —
the plan split and the balancing property the operator exists for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.skewjoin import salted_skew_join
from mapreduce_lab_spark.plans import inspect


def _planted(spark, n_hot=400, n_cold=50):
    # One pathological key carrying n_hot probe rows, plus a cold tail.
    probe = spark.range(n_hot).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    ).unionByName(
        spark.range(n_cold).select(
            (F.col("id") + 100).alias("k"), (F.col("id") + 10_000).alias("row_id")
        )
    )
    build = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    return probe, build


def test_skew_join_matches_plain_join(spark):
    probe, build = _planted(spark)
    got = salted_skew_join(
        probe, build, key="k", salt_cols=["k", "row_id"], n_salts=4, hot_threshold=50
    )
    want = probe.join(build, "k", "inner")
    assert sorted(got.collect()) == sorted(want.collect())


def test_hot_key_spreads_over_salts(spark):
    probe, build = _planted(spark)
    salted = probe.join(
        probe.groupBy("k").count().where(F.col("count") >= 50).select("k"),
        "k",
        "left_semi",
    ).withColumn("_salt", F.pmod(F.hash("k", "row_id"), F.lit(4)))
    sizes = (
        salted.groupBy("k", "_salt").count().groupBy("k").agg(
            F.max("count").alias("mx"), F.count("*").alias("n_groups")
        )
    ).collect()
    # The 400-row hot key must occupy all 4 salt groups, each well
    # under the unsalted 400-row group.
    assert len(sizes) == 1
    assert sizes[0]["n_groups"] == 4
    assert sizes[0]["mx"] < 200


def test_skew_join_plan_has_two_join_paths_and_broadcast_split(spark):
    probe, build = _planted(spark)
    df = salted_skew_join(
        probe, build, key="k", salt_cols=["k", "row_id"], n_salts=4, hot_threshold=50
    )
    plan = inspect.formatted_plan(df)
    assert "Union" in plan, plan
    # Hot-key semi/anti splits ride broadcast joins (no extra shuffle
    # of either fact side for the split itself).
    assert inspect.broadcast_join_count(df) >= 3, plan


from hypothesis import given, settings, strategies as st

from tests.fuzzbudget import examples


@settings(max_examples=examples(10), deadline=None)
@given(
    probe_keys=st.lists(st.integers(min_value=0, max_value=12),
                        min_size=0, max_size=60),
    build_keys=st.lists(st.integers(min_value=0, max_value=12),
                        min_size=0, max_size=20),
    threshold=st.sampled_from([1, 3, 8]),
    n_salts=st.sampled_from([1, 2, 5]),
)
def test_skew_join_equals_plain_join_under_random_inputs(
    spark, probe_keys, build_keys, threshold, n_salts
):
    """For any multisets, hot threshold, and salt count — including
    degenerate ones (everything hot, nothing hot, empty sides,
    duplicate build keys) — the split join is row-identical to the
    plain inner join."""
    probe = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe_keys)] or [(None, None)],
        "k int, row_id int",
    )
    build = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(build_keys)] or [(None, None)],
        "k int, payload int",
    )
    if not probe_keys:
        probe = probe.where(F.col("k").isNotNull())
    if not build_keys:
        build = build.where(F.col("k").isNotNull())
    got = salted_skew_join(
        probe, build, key="k", salt_cols=["k", "row_id"],
        n_salts=n_salts, hot_threshold=threshold,
    )
    want = probe.join(build, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
