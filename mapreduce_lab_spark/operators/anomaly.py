"""Outlier / anomaly detection over grouped numeric columns.

Superset surface: the data-quality gate of a training pipeline
(drop price anomalies before aggregation, flag telemetry spikes).
Two classic detectors, both exact and engine-portable:

- ``iqr_outlier_orders``: Tukey fences per group — q1/q3 via exact
  type-7 percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
  bit-for-bit, see exact_percentiles_lineitem), fence arithmetic on
  doubles with identical expression trees.
- ``zscore_outlier_events``: |x − μ| > 2σ per group, decided ENTIRELY
  in integer arithmetic. With x in fixed-point units, the test
  |x−μ|>kσ is equivalent to n²·(x·n − S)² > k²·n²·(n·Q − S²)/n …
  reduced here to (n·x − S)² > k²·(n·Q − S²) with S=Σx, Q=Σx² —
  integer sums only, so the result is order-independent and
  hash-exact (a float mean/stddev differs between engines in the
  last ulp depending on summation order). Overflow envelope: with
  unit values ≤1e4 the comparison stays inside int64 up to ~4e10
  rows per group; past that the sums cast to DECIMAL(38,0) — same
  trade documented in functions/numeric.py.

Scale shape: one map-side-combinable aggregation per group for the
stats, then a broadcast join of the tiny per-group stats frame back
onto the facts — no second full shuffle, no window over fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import (
    exact_avg,
    oracle_exact_avg,
    oracle_units,
    to_units,
)
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

ZSCORE_K = 2


def iqr_outliers(orders: DataFrame) -> DataFrame:
    """Per-priority Tukey-fence outlier counts on o_totalprice."""
    fences = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
    )
    flagged = orders.join(F.broadcast(fences), "o_orderpriority").where(
        (F.col("o_totalprice") > F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1")))
        | (
            F.col("o_totalprice")
            < F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
        )
    )
    counts = flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_outliers"),
        F.max("o_totalprice").alias("max_outlier_price"),
    )
    # Left join keeps priorities with zero outliers in the report.
    return (
        fences.join(F.broadcast(counts), "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "q1",
            "q3",
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
            "max_outlier_price",
        )
    )


@query(
    "iqr_outlier_orders",
    oracle="""
    WITH fences AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY o_orderpriority
    ),
    counts AS (
        SELECT o.o_orderpriority,
               count(*) AS n_outliers,
               max(o.o_totalprice) AS max_outlier_price
        FROM orders o JOIN fences f USING (o_orderpriority)
        WHERE o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
           OR o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
        GROUP BY o.o_orderpriority
    )
    SELECT f.o_orderpriority, f.q1, f.q3,
           coalesce(c.n_outliers, 0) AS n_outliers,
           c.max_outlier_price
    FROM fences f LEFT JOIN counts c USING (o_orderpriority)
    """,
)
def q_iqr_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return iqr_outliers(load_table(spark, sf_dir, "orders"))


def zscore_outliers(events: DataFrame) -> DataFrame:
    """Per-type count of events with |value − μ| > 2σ, integer-exact."""
    ev = events.select("event_type", to_units("value", 100).alias("u"))
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("u").alias("s"),
        F.sum(F.col("u") * F.col("u")).alias("q"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    # (n·x − S)² > k²·(n·Q − S²)  ⇔  |x − μ| > kσ (population σ).
    # Squared via explicit multiply — Column**2 lowers to pow(), which
    # returns DOUBLE and would break the all-integer exactness.
    dev = F.col("n") * F.col("u") - F.col("s")
    lhs = dev * dev
    rhs = F.lit(ZSCORE_K * ZSCORE_K) * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(F.when(lhs > rhs, 1).otherwise(0)).alias("n_outliers"),
            exact_avg(F.max("s"), F.max("n"), 100).alias("mean_value"),
        )
    )


@query(
    "zscore_outlier_events",
    oracle=f"""
    WITH u AS (SELECT event_type, {oracle_units("value", 100)} AS u FROM events),
    stats AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(u) AS BIGINT) AS s,
               CAST(sum(u * u) AS BIGINT) AS q
        FROM u GROUP BY event_type
    )
    SELECT u.event_type,
           max(s.n) AS n_events,
           CAST(sum(CASE WHEN (s.n * u.u - s.s) * (s.n * u.u - s.s)
                          > {ZSCORE_K * ZSCORE_K} * (s.n * s.q - s.s * s.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           {oracle_exact_avg("max(s.s)", "max(s.n)", 100)} AS mean_value
    FROM u JOIN stats s USING (event_type)
    GROUP BY u.event_type
    """,
)
def q_zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zscore_outliers(load_table(spark, sf_dir, "events"))


# --- winsorization ---------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_price_stats(lineitem: DataFrame) -> DataFrame:
    """Per-group winsorized price aggregate: clamp to [p05, p95], then
    sum in exact integer units.

    The standard heavy-tail guard before computing training statistics:
    per-group exact percentiles (type-7, bit-identical in Spark and
    DuckDB — see exact_percentiles_lineitem), broadcast back to the
    fact rows, clamp, and aggregate. The clamped value is scaled to
    integer cents BEFORE the sum, so the total is order-free; the
    clamp comparisons are exact double compares of identical inputs.

    Scale shape: one fact-side aggregation for the bounds (map-side
    partial), a broadcast join back (fact table never shuffles for
    it), then one final grouped aggregation.
    """
    bounds = lineitem.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, {WINSOR_LO})").alias("p_lo"),
        F.expr(f"percentile(l_extendedprice, {WINSOR_HI})").alias("p_hi"),
    )
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p_lo")), F.col("p_hi"))
    return (
        lineitem.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("p_lo"), 1).otherwise(0)
            ).alias("n_clamped_low"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("p_hi"), 1).otherwise(0)
            ).alias("n_clamped_high"),
            (F.sum(to_units(clamped, 100)).cast("double") / F.lit(100)).alias(
                "sum_winsorized"
            ),
        )
    )


@query(
    "winsorized_price_stats",
    oracle=f"""
    WITH bounds AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, {WINSOR_LO}) AS p_lo,
               quantile_cont(l_extendedprice, {WINSOR_HI}) AS p_hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(sum(CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           (CAST(sum({oracle_units("least(greatest(l_extendedprice, p_lo), p_hi)", 100)})
                 AS DOUBLE) / 100) AS sum_winsorized
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorized_price_stats(load_table(spark, sf_dir, "lineitem"))


# --- MAD (median absolute deviation) robust outliers -----------------------

MAD_K_PERMILLE = 3_000  # flag |x - median| > 3.0 * MAD (permille exact)


def mad_outlier_events(events: DataFrame) -> DataFrame:
    """Per-event-type robust outliers: |x − median| > 3·MAD.

    The estimator breakdown point is 50% — unlike mean/stddev, a
    minority of wild values cannot drag the fences, which is why
    telemetry pipelines prefer MAD. Two exact passes: (1) per-group
    median (type-7 percentile, bit-identical cross-engine), broadcast
    back; (2) per-group median of |x − m| the same way. The decision
    comparison is safe on raw doubles here — unlike the z-score's
    order-dependent float sums, every input to it (median, MAD,
    deviation) is an order-independent percentile or a single
    subtraction, so both engines compare identical bit patterns.

    Scale shape: two map-side-combinable grouped aggregations over
    the facts with the tiny stats frames broadcast back — the fact
    table shuffles zero times (stats travel to the data). Exact
    medians at 100 TB group sizes are the one honest cost; the scale
    relief valve is percentile_approx with a pinned error bound,
    which changes the estimator, not the plan shape.
    """
    m = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(F.broadcast(m), "event_type").select(
        "event_type",
        "event_id",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").where(
        F.col("adev") > F.lit(MAD_K_PERMILLE / 1000.0) * F.col("mad")
    )
    return flagged.select(
        "event_type",
        "event_id",
        F.round("value", 2).alias("value"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
    )


@query(
    "mad_outlier_events",
    oracle=f"""
    WITH m AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value,
               abs(e.value - m.med) AS adev, m.med
        FROM events e JOIN m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.event_id,
           round(d.value, 2) AS value,
           round(d.med, 6) AS med,
           round(md.mad, 6) AS mad
    FROM dev d JOIN mad md USING (event_type)
    WHERE d.adev > {MAD_K_PERMILLE / 1000.0} * md.mad
    """,
)
def q_mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outlier_events(load_table(spark, sf_dir, "events"))
