"""Accuracy contract for the sketch-based operators (no SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.relational_extra import q_approx_distinct_users
from mapreduce_lab_spark.sources.tables import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users
        for r in q_approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 0.02 * ex), (k, approx[k], ex)
