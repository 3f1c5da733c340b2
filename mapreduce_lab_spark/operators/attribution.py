"""Marketing-style attribution: split conversion value across the
preceding touchpoints.

Complements the as-of join (``events.py:asof_join_purchase_to_view``
— LAST-touch attribution) with LINEAR attribution: each purchase's
value splits equally across ALL the user's views in the preceding
hour. The split is exact integer arithmetic — each view gets
``units div k`` and the remainder goes to the earliest view — so the
per-user totals are integer sums (order-independent, engine-exact)
and the attributed total equals the purchase total to the cent, a
conservation law the test suite can assert.

Scale shape: the purchase→view match is an equi-join on ``user_id``
with a time-range residual — Spark plans the hash join on the user
key and filters the hour window as a residual predicate, so the
shuffle is keyed by user (high cardinality, no theta-join blowup;
fan-out bounded by views-per-user-per-hour). The per-purchase count
and first-view flag are windows over ``purchase_id`` — again high
cardinality, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import oracle_units, to_units
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

ATTRIBUTION_WINDOW = "1 hour"


def linear_attribution(events: DataFrame) -> DataFrame:
    """Per-user linearly-attributed purchase value over 1h windows."""
    views = events.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        to_units("value", 100).alias("units"),
    )
    pairs = purchases.join(views, "user_id").where(
        (F.col("view_ts") <= F.col("p_ts"))
        & (F.col("view_ts") > F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"))
    )
    wp = Window.partitionBy("p_id")
    wo = Window.partitionBy("p_id").orderBy("view_ts", "view_id")
    attributed = (
        pairs.withColumn("k", F.count("*").over(wp))
        .withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "attr_units",
            F.expr("units div k")
            + F.when(F.col("rn") == 1, F.expr("units % k")).otherwise(F.lit(0)),
        )
    )
    return attributed.groupBy("user_id").agg(
        F.count_distinct("p_id").alias("n_purchases"),
        (F.sum("attr_units").cast("double") / F.lit(100)).alias("attributed_value"),
    )


@query(
    "attribution_linear",
    oracle=f"""
    WITH views AS (
        SELECT user_id, ts AS view_ts, event_id AS view_id
        FROM events WHERE event_type = 'view'
    ),
    purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id,
               {oracle_units("value", 100)} AS units
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.user_id, p.p_id, p.units, v.view_ts, v.view_id
        FROM purchases p JOIN views v USING (user_id)
        WHERE v.view_ts <= p.p_ts
          AND v.view_ts > p.p_ts - INTERVAL 1 HOUR
    ),
    split AS (
        SELECT user_id, p_id,
               units // count(*) OVER (PARTITION BY p_id)
               + CASE WHEN row_number() OVER (PARTITION BY p_id
                                              ORDER BY view_ts, view_id) = 1
                      THEN units % count(*) OVER (PARTITION BY p_id)
                      ELSE 0 END AS attr_units
        FROM pairs
    )
    SELECT user_id,
           count(DISTINCT p_id) AS n_purchases,
           CAST(sum(attr_units) AS DOUBLE) / 100 AS attributed_value
    FROM split
    GROUP BY user_id
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return linear_attribution(load_table(spark, sf_dir, "events"))
