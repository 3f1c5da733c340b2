"""Linear attribution: conservation and shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import to_units
from mapreduce_lab_spark.operators.attribution import linear_attribution
from mapreduce_lab_spark.sources.tables import load_table


def test_attribution_conserves_value_to_the_cent(spark, sf_dir):
    # Every purchase with >=1 view in the preceding hour must have its
    # value split EXACTLY (div + remainder-to-earliest): the sum of
    # attributed units equals the sum of matched purchases' units.
    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        to_units("value", 100).alias("units"),
    )
    matched = (
        purchases.join(views, "user_id")
        .where(
            (F.col("view_ts") <= F.col("p_ts"))
            & (F.col("view_ts") > F.col("p_ts") - F.expr("INTERVAL 1 hour"))
        )
        .select("p_id", "units")
        .distinct()
    )
    expected = matched.agg(F.sum("units")).collect()[0][0]

    got = (
        linear_attribution(events)
        .agg(F.round(F.sum(F.col("attributed_value") * 100)).cast("long"))
        .collect()[0][0]
    )
    assert expected == got, (expected, got)
    assert expected is not None and expected > 0
