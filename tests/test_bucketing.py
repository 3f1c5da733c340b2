"""Bucketed co-located joins: the pay-once-shuffle-never layout.

At 100 TB the dominant cost of fact-fact joins is the shuffle; tables
bucketed on the join key with matching bucket counts join with no
Exchange at all. This test pins that plan property end-to-end through
the write path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_lab_spark.plans import inspect
from mapreduce_lab_spark.sources.sinks import write_bucketed_table
from mapreduce_lab_spark.sources.tables import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucket_db(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{d}'")
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "bucketdb.orders_b",
        bucket_cols=["o_orderkey"],
        n_buckets=N_BUCKETS,
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "bucketdb.lineitem_b",
        bucket_cols=["l_orderkey"],
        n_buckets=N_BUCKETS,
        sort_cols=["l_orderkey"],
    )
    yield "bucketdb"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucket_db):
    # hint forces a (shuffle-eligible) sort-merge join — at test scale
    # the tables are broadcast-small, at real scale they wouldn't be,
    # and SMJ is exactly the plan whose shuffle bucketing removes.
    o = spark.table("bucketdb.orders_b").hint("merge")
    li = spark.table("bucketdb.lineitem_b")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("qty")
    )
    plan = inspect.formatted_plan(joined)
    assert "SortMergeJoin" in plan, plan
    # no Exchange anywhere: bucket layout satisfies the join's required
    # distribution on both sides AND the downstream groupBy on the
    # same key.
    assert inspect.exchange_count(joined) == 0, plan

    # and the result is right
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
