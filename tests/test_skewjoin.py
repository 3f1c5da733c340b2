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
