"""Hand-solvable chain for the Markov removal-effect attribution.

Two users: A = [click, purchase], B = [view] (no conversion).
Chain: start->click, start->view (p 1/2 each); click->conv certain;
view->null certain. Base conversion = 0.5. Removing click kills the
only converting path (effect 0.5, share 1.0); removing view changes
nothing (effect 0, share 0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.attribution import (
    journey_transitions,
    markov_removal_attribution,
)

SCHEMA = "user_id long, ts string, event_id long, event_type string"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).select(
        "user_id", F.to_timestamp("ts").alias("ts"), "event_id", "event_type"
    )


def test_transitions_truncate_at_first_purchase(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-01 00:01:00", 2, "purchase"),
        (1, "2024-01-01 00:02:00", 3, "view"),  # after conversion: dropped
        (2, "2024-01-01 00:00:00", 4, "view"),
    ]
    got = sorted(
        (r["frm"], r["to_"])
        for r in journey_transitions(_events(spark, rows)).collect()
    )
    assert got == [
        ("click", "conv"),
        ("start", "click"),
        ("start", "view"),
        ("view", "null"),
    ]


def test_removal_effect_credits_the_converting_channel(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-01 00:01:00", 2, "purchase"),
        (2, "2024-01-01 00:00:00", 3, "view"),
    ]
    got = {
        r["channel"]: r
        for r in markov_removal_attribution(_events(spark, rows)).collect()
    }
    assert got["click"]["n_in"] == 1 and got["view"]["n_in"] == 1
    assert abs(got["click"]["removal_effect"] - 0.5) < 1e-6
    assert got["view"]["removal_effect"] == 0.0
    assert abs(got["click"]["attribution_share"] - 1.0) < 1e-6
    assert got["view"]["attribution_share"] == 0.0


def test_life_table_censoring(spark):
    # 3 users sign up on day 0; u1 converts day 1, u2 converts day 3,
    # u3 never does (censored at the observation end = day 3).
    from mapreduce_lab_spark.operators.lifecycle import life_table_signup_purchase

    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup"),
        (2, "2024-01-01 00:00:00", 2, "signup"),
        (3, "2024-01-01 00:00:00", 3, "signup"),
        (1, "2024-01-02 00:00:00", 4, "purchase"),
        (2, "2024-01-04 00:00:00", 5, "purchase"),
    ]
    got = {
        r["t_days"]: r
        for r in life_table_signup_purchase(_events(spark, rows)).collect()
    }
    assert got[1]["n_risk"] == 3 and got[1]["d_converted"] == 1
    assert abs(got[1]["hazard"] - 1 / 3) < 1e-5
    assert got[3]["n_risk"] == 2
    assert got[3]["d_converted"] == 1 and got[3]["n_censored"] == 1
    assert got[3]["hazard"] == 0.5
