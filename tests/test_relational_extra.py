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


# --- ewma_daily_revenue ------------------------------------------------------


def test_ewma_matches_pure_python(spark):
    """Trailing-window alpha=1/2 EWMA against a reference loop."""
    import datetime

    from mapreduce_lab_spark.operators.timeseries import (
        EWMA_WINDOW,
        ewma_daily_revenue,
    )

    vals = [100.0, 200.0, 50.0, 400.0, 25.5, 10.0, 900.25, 33.33]
    rows = [
        ("1-URGENT", datetime.date(2020, 1, d + 1), v) for d, v in enumerate(vals)
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
    )
    got = {
        r["day"]: r["ewma"] for r in ewma_daily_revenue(orders).collect()
    }
    for t in range(len(vals)):
        frame = vals[max(0, t - EWMA_WINDOW + 1) : t + 1]
        num = sum(x * 0.5 ** (len(frame) - 1 - i) for i, x in enumerate(frame))
        den = sum(0.5 ** (len(frame) - 1 - i) for i in range(len(frame)))
        want = num / den
        day = f"2020-01-{t + 1:02d}"
        assert abs(got[day] - want) < 1e-3, (day, got[day], want)


def test_ewma_smooths_less_than_it_lags(spark):
    """EWMA of a constant series is the constant (weights normalize)."""
    import datetime

    from mapreduce_lab_spark.operators.timeseries import ewma_daily_revenue

    rows = [
        ("P", datetime.date(2020, 2, d + 1), 77.25) for d in range(25)
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderpriority", "o_orderdate", "o_totalprice"]
    )
    for r in ewma_daily_revenue(orders).collect():
        assert abs(r["ewma"] - 77.25) < 1e-6
