"""Time-series operators: gap-filling with LOCF and OHLC downsampling.

The reference has no notion of time at all (its inputs are static
text files, ``test.sh:70-107``); this is superset surface for the
metrics/telemetry half of a data platform — the batch twins of what
a hypertable engine calls ``time_bucket_gapfill`` and ``candlestick``
rollups.

Scale shape (100 TB of events):

- Per-bucket aggregation is an ordinary groupBy on the bucket key —
  map-side combinable, value payload reduced to exact integer units
  before the shuffle.
- The bucket *spine* (one row per 15-minute interval) is generated
  with ``sequence()`` from the observed min/max bucket — its size is
  bounded by the TIME RANGE, not the data volume (a decade of 15-min
  buckets is ~350k rows), so spine-side operations — the gap left
  join and the LOCF window — are dimension-sized no matter how many
  events feed them. The LOCF window is a single global sort over that
  spine; that is deliberate and safe for the same reason (time-
  bounded cardinality), unlike a global window over event rows.
- OHLC open/close use min/max over a (ts, event_id, value) struct —
  lexicographic struct ordering gives deterministic first/last under
  ts ties, stays map-side combinable, and never materializes a
  per-group row list.

Exactness: gap-filled sums use the fixed-point unit conventions of
``functions/numeric.py`` (integer sums, order-independent); OHLC
moves raw values without arithmetic, so doubles are hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import oracle_units, to_units
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

GAPFILL_STEP = "15 minutes"
GAPFILL_EVENT_TYPE = "signup"


def gapfill_locf(events: DataFrame, step: str = GAPFILL_STEP) -> DataFrame:
    """Complete 15-min series of signup counts; value sums carried
    forward (LOCF) across empty buckets, zeros for gap counts."""
    per_bucket = (
        events.where(F.col("event_type") == GAPFILL_EVENT_TYPE)
        .groupBy(F.window("ts", step).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(to_units("value", 100)).alias("sum_units"),
        )
        .select(F.col("w.start").alias("bucket"), "n_events", "sum_units")
    )
    bounds = per_bucket.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))).alias("bucket")
    )
    filled = spine.join(per_bucket, "bucket", "left")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return filled.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (
            F.last("sum_units", ignorenulls=True).over(w).cast("double") / F.lit(100)
        ).alias("locf_sum_value"),
    )


@query(
    "gapfill_locf_signups",
    oracle=f"""
    WITH b AS (
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
               count(*) AS n_events,
               CAST(sum({oracle_units("value", 100)}) AS BIGINT) AS sum_units
        FROM events
        WHERE event_type = '{GAPFILL_EVENT_TYPE}'
        GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series((SELECT min(bucket) FROM b),
                                      (SELECT max(bucket) FROM b),
                                      INTERVAL 15 MINUTE)) AS bucket
    ),
    filled AS (
        SELECT s.bucket, coalesce(b.n_events, 0) AS n_events, b.sum_units
        FROM spine s LEFT JOIN b USING (bucket)
    )
    SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
           n_events,
           CAST(last_value(sum_units IGNORE NULLS) OVER (
                    ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS locf_sum_value
    FROM filled
    """,
)
def q_gapfill_locf_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_locf(load_table(spark, sf_dir, "events"))


def ohlc_daily(events: DataFrame) -> DataFrame:
    """Daily open/high/low/close of ``value`` per event type."""
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        events.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            first.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.getField("value").alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "ohlc_daily_by_type",
    oracle="""
    WITH ranked AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value,
               row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                                  ORDER BY ts ASC, event_id ASC) AS rn_a,
               row_number() OVER (PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, day,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n_events
    FROM ranked
    GROUP BY event_type, day
    """,
)
def q_ohlc_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_daily(load_table(spark, sf_dir, "events"))


def gapfill_interp(events: DataFrame, step: str = GAPFILL_STEP) -> DataFrame:
    """Complete 15-min signup series with LINEAR interpolation across
    empty buckets (the other half of ``time_bucket_gapfill``).

    For a gap bucket at time t between observations (t0, v0) and
    (t1, v1): v = v0 + floor((v1-v0)·(t-t0)/(t1-t0)) in integer cent
    units — one floor of an exact double ratio, identical in both
    engines (the same discipline as exact_ratio; a float slope
    accumulated per step would drift and is order-sensitive).
    Leading/trailing gaps (no neighbor on one side) carry the single
    available neighbor. All four neighbor columns come from two
    IGNORE NULLS window passes over the time-bounded spine — the
    window is global but dimension-sized (see module docstring).
    """
    per_bucket = (
        events.where(F.col("event_type") == GAPFILL_EVENT_TYPE)
        .groupBy(F.window("ts", step).alias("w"))
        .agg(F.sum(to_units("value", 100)).alias("sum_units"))
        .select(F.col("w.start").alias("bucket"), "sum_units")
    )
    bounds = per_bucket.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))).alias("bucket")
    )
    filled = spine.join(per_bucket, "bucket", "left").withColumn(
        "t", F.unix_timestamp("bucket")
    )
    obs_t = F.when(F.col("sum_units").isNotNull(), F.col("t"))
    back = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("bucket").rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("sum_units", ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first("sum_units", ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)
    interp_units = (
        F.when(F.col("sum_units").isNotNull(), F.col("sum_units"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(
            prev_v
            + F.floor(
                (next_v - prev_v).cast("double")
                * (F.col("t") - prev_t)
                / (next_t - prev_t)
            )
        )
    )
    return filled.select(
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("sum_units").isNotNull().alias("observed"),
        (interp_units.cast("double") / F.lit(100)).alias("interp_sum_value"),
    )


@query(
    "gapfill_interp_signups",
    oracle=f"""
    WITH b AS (
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
               CAST(sum({oracle_units("value", 100)}) AS BIGINT) AS sum_units
        FROM events
        WHERE event_type = '{GAPFILL_EVENT_TYPE}'
        GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series((SELECT min(bucket) FROM b),
                                      (SELECT max(bucket) FROM b),
                                      INTERVAL 15 MINUTE)) AS bucket
    ),
    filled AS (
        SELECT s.bucket, b.sum_units, epoch(s.bucket) AS t
        FROM spine s LEFT JOIN b USING (bucket)
    ),
    nbr AS (
        SELECT bucket, sum_units, t,
               last_value(sum_units IGNORE NULLS) OVER (
                   ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               last_value(CASE WHEN sum_units IS NOT NULL THEN t END IGNORE NULLS) OVER (
                   ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
               first_value(sum_units IGNORE NULLS) OVER (
                   ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               first_value(CASE WHEN sum_units IS NOT NULL THEN t END IGNORE NULLS) OVER (
                   ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
        FROM filled
    )
    SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS window_start,
           sum_units IS NOT NULL AS observed,
           CAST(CASE
                WHEN sum_units IS NOT NULL THEN sum_units
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + CAST(floor(CAST(next_v - prev_v AS DOUBLE)
                                         * (t - prev_t) / (next_t - prev_t))
                              AS BIGINT)
           END AS DOUBLE) / 100 AS interp_sum_value
    FROM nbr
    """,
)
def q_gapfill_interp_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_interp(load_table(spark, sf_dir, "events"))


# --- rolling exact distinct ------------------------------------------------

ROLLING_WINDOW_DAYS = 7


def rolling_distinct_users(events: DataFrame, days: int = ROLLING_WINDOW_DAYS) -> DataFrame:
    """Exact trailing-7-day distinct users per day — the sliding
    DISTINCT aggregate, which unlike sliding COUNTs cannot be composed
    from per-day partials (distinct doesn't add).

    The scalable construction is contribute-to-window explode: each
    (user, active-day) pair — already deduplicated, one row per user
    per day — contributes to the ``days`` report days it is visible
    from, then one count_distinct per report day. Shuffle volume is
    days × |user-day pairs|, a FIXED small multiple of the
    deduplicated activity table (never of raw events), traded for
    exactness; the approximate alternative is the HLL rollup in
    operators/sketches.py (partials union across any window freely).
    Report days are emitted only up to the data's last active day
    (trailing windows beyond it would report phantom partial tails).
    """
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    max_day = user_days.agg(F.max("day").alias("mx"))
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), days - 1))
        ).alias("report_day"),
    )
    return (
        contrib.join(F.broadcast(max_day), contrib.report_day <= F.col("mx"))
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("day"), "n_users_7d"
        )
    )


_ROLLING_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT max(day) AS mx FROM ud),
contrib AS (
    SELECT user_id, day + CAST(i AS INTEGER) AS report_day
    FROM ud, (SELECT unnest(range(0, {ROLLING_WINDOW_DAYS})) AS i)
)
SELECT strftime(report_day, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users_7d
FROM contrib, mx
WHERE report_day <= mx
GROUP BY report_day
"""


@query("rolling_7d_distinct_users", oracle=_ROLLING_SQL)
def q_rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-week distinct users per day (explode-to-window)."""
    return rolling_distinct_users(load_table(spark, sf_dir, "events"))


# --- exponentially weighted moving average ----------------------------------

EWMA_WINDOW = 20  # trailing rows per series
# Window 20 keeps the largest shifted term (cents * 2^19) within both
# int64 and the 2^53 double-exact range up to ~1e13 cents/day/key —
# sf1000 headroom; the true-100 TB variant would switch the
# accumulator to DECIMAL(38) per functions/numeric.py.
# alpha = 1/2: weights are exact powers of two, so the weighted sum is
# EXACT INTEGER arithmetic in both engines (shift-left on cent units)
# — the one decay constant that needs no float powers at all.
EWMA_SHIFT = EWMA_WINDOW - 1


def ewma_daily_revenue(orders: DataFrame) -> DataFrame:
    """Per-priority daily revenue with its trailing-EWMA_WINDOW-row
    EWMA — the window counts trailing PRESENT ROWS of the per-priority
    daily series, not calendar days (alpha = 1/2, finite window,
    adjust-style normalization: ewma_t = sum_j w^j x_{t-j} / sum_j w^j
    over the frame).

    Shape at scale: the daily rollup is an ordinary map-side-combined
    groupBy; the window then runs over DAYS-per-priority — dimension-
    sized series (a decade is ~3.6k rows per key), so the per-key sort
    is bounded by the time range, not order volume, same argument as
    the gapfill spine above. Exactness: cent units shifted left by
    (EWMA_SHIFT - j) make both weighted sums integers; the single closing
    division is the shared exact-floor ratio, so Spark and DuckDB
    agree bit-for-bit — no float pow() anywhere.
    """
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(to_units("o_totalprice", 100)).alias("rev_units"))
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow)
    )
    lst = F.collect_list("rev_units").over(w)  # frame order: oldest -> current
    L = F.size(lst)
    num = F.aggregate(
        F.sequence(F.lit(1), L),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.element_at(lst, i)
        * F.pow(F.lit(2.0), (EWMA_SHIFT - L + i).cast("double")).cast("long"),
    )
    den = F.aggregate(
        F.sequence(F.lit(1), L),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.pow(F.lit(2.0), (EWMA_SHIFT - L + i).cast("double")).cast("long"),
    )
    return (
        daily.select(
            "priority",
            "day",
            (F.col("rev_units").cast("double") / 100).alias("revenue"),
            F.floor(num.cast("double") * 100 / den).cast("double").alias("e100"),
        )
        .select(
            "priority",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "revenue",
            (F.col("e100") / 10000).alias("ewma"),
        )
    )


@query(
    "ewma_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate::DATE AS day,
             CAST(sum(round(o_totalprice * 100)::BIGINT) AS BIGINT) AS rev_units
      FROM orders GROUP BY 1, 2
    ), win AS (
      SELECT priority, day, rev_units,
             list(rev_units) OVER (
               PARTITION BY priority ORDER BY day
               ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW) AS l
      FROM daily
    )
    SELECT priority, strftime(day, '%Y-%m-%d') AS day,
           (rev_units::DOUBLE / 100) AS revenue,
           (floor(
              list_sum([l[i] * (1::BIGINT << ({EWMA_SHIFT} - len(l) + i))
                        for i in range(1, len(l) + 1)])::DOUBLE * 100
              / list_sum([(1::BIGINT << ({EWMA_SHIFT} - len(l) + i))
                          for i in range(1, len(l) + 1)]))
            / 10000) AS ewma
    FROM win
    """,
)
def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_daily_revenue(load_table(spark, sf_dir, "orders"))


# --- seasonal-naive forecast + backtest MAE ---------------------------------

SEASON_DAYS = 7


def seasonal_naive_mae(orders: DataFrame) -> DataFrame:
    """Per order-priority: the backtest MAE of the seasonal-naive
    forecaster (predict today's revenue = revenue SEASON_DAYS ago) —
    the baseline every demand/capacity forecast must beat, and the
    cheapest possible drift alarm on a revenue stream.

    Calendar-correct: the lag is a self-join on (priority, day - 7),
    NOT a 7-ROW window lag — missing days must not slide the season.
    Exact fixed-point units throughout: daily sums are exact integer
    cents, |actual - forecast| stays integer, and only the final MAE
    division renders a double, so the hash gate is exact.

    Scale shape: one map-side-combinable (priority, day) aggregate,
    then a self-join on the same key the aggregate just partitioned
    by — Catalyst reuses the partitioning; frames are calendar-sized.
    """
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(to_units(F.col("o_totalprice"), 100)).alias("units"))
    cur = daily.select("priority", "day", "units")
    past = daily.select(
        "priority",
        F.date_add("day", SEASON_DAYS).alias("day"),
        F.col("units").alias("f_units"),
    )
    scored = cur.join(past, ["priority", "day"])
    err = F.abs(F.col("units") - F.col("f_units"))
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum(err).cast("double") / (F.count(F.lit(1)) * 100)).alias("mae"),
    ).select("priority", "n_days", "mae")


@query(
    "seasonal_naive_mae",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority,
             CAST(o_orderdate AS DATE) AS day,
             sum({oracle_units('o_totalprice', 100)}) AS units
      FROM orders GROUP BY 1, 2
    ), scored AS (
      SELECT c.priority, abs(c.units - p.units) AS err
      FROM daily c
      -- DATE - INTEGER stays DATE in DuckDB (an INTERVAL arithmetic
      -- would type as TIMESTAMP and silently fail the equi-join)
      JOIN daily p ON p.priority = c.priority
                  AND p.day = c.day - {SEASON_DAYS}
    )
    SELECT priority, count(*) AS n_days,
           (CAST(sum(err) AS DOUBLE) / (count(*) * 100)) AS mae
    FROM scored GROUP BY priority
    """,
)
def q_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_naive_mae(load_table(spark, sf_dir, "orders"))


# --- additive seasonal decomposition (STL-lite) ------------------------------

# value = trend + seasonal + residual over the daily revenue series:
# trend is a centered 7-day moving average (RANGE frame on the
# calendar key, so missing days never slide the window), the seasonal
# component is the per-weekday mean of the detrended series, and the
# residual is what remains — flagged as anomalous when it exceeds
# ANOM_K x the mean absolute residual. The classical decomposition
# (Cleveland et al.'s STL, 1990, is the loess refinement of exactly
# this shape).
#
# All-integer pipeline: daily sums are exact cents, the two means are
# floor-divisions of int64s (identical IEEE ops in both engines), so
# trend/seasonal/residual — and the anomaly FLAG, the part a float
# pipeline would flip at the last ulp — are bit-stable cross-engine.
#
# Weekday comes from datediff(day, anchor) % 7, NOT dayofweek():
# Spark numbers Sunday=1 while DuckDB's dayofweek is Sunday=0 — the
# integer day-key modulus is engine-neutral.

TREND_HALF_WINDOW = 3  # +/- days around each day -> 7-day centered trend
ANOM_K = 3
_SEASON_ANCHOR = "1992-01-01"


def seasonal_decompose_revenue(orders: DataFrame) -> DataFrame:
    """Per day: revenue, trend, seasonal, residual (all exact-cents
    rendered as dollars) and an anomaly flag on the residual.

    Scale shape: ONE map-side-combinable aggregate over the order rows
    reduces everything downstream to the calendar-sized daily frame
    (~2.4k rows for seven years — bounded by the time range, not the
    data volume, like the gapfill spine above); the trend window, the
    7-row seasonal join (broadcast hash), and the 1-row threshold
    frame all operate on that dimension-sized series.
    """
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(to_units(F.col("o_totalprice"), 100)).alias("u")
    )
    keyed = daily.select(
        "day",
        "u",
        F.datediff(F.col("day"), F.lit(_SEASON_ANCHOR)).alias("dk"),
    )
    wt = (
        Window.orderBy("dk")
        .rangeBetween(-TREND_HALF_WINDOW, TREND_HALF_WINDOW)
    )
    tr = keyed.select(
        "day",
        "dk",
        "u",
        F.floor(F.sum("u").over(wt).cast("double") / F.count(F.lit(1)).over(wt)).alias("t"),
    )
    # cache: dt feeds both the weekday-seasonal aggregate and the join
    # back — one materialization, one orders scan (calendar-sized frame).
    dt = tr.select(
        "day",
        "u",
        "t",
        (F.col("u") - F.col("t")).alias("detr"),
        F.pmod(F.col("dk"), F.lit(7)).cast("int").alias("dow"),
    ).cache()
    sea = dt.groupBy("dow").agg(
        F.floor(F.sum("detr").cast("double") / F.count(F.lit(1))).alias("s")
    )
    # cache: the residual frame feeds both the threshold aggregate and
    # the output projection — one materialization of the (calendar-
    # sized) series instead of two order scans.
    res = dt.join(F.broadcast(sea), "dow").select(
        "day", "dow", "u", "t", "s", (F.col("detr") - F.col("s")).alias("r")
    ).cache()
    thr = res.agg(
        F.floor(F.sum(F.abs(F.col("r"))).cast("double") / F.count(F.lit(1))).alias(
            "mean_abs_r"
        )
    )
    return res.crossJoin(F.broadcast(thr)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        (F.col("u").cast("double") / 100).alias("revenue"),
        (F.col("t").cast("double") / 100).alias("trend"),
        (F.col("s").cast("double") / 100).alias("seasonal"),
        (F.col("r").cast("double") / 100).alias("residual"),
        (F.abs(F.col("r")) > F.lit(ANOM_K) * F.col("mean_abs_r")).cast("int").alias(
            "is_anomaly"
        ),
    )


@query(
    "seasonal_decompose_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum({oracle_units('o_totalprice', 100)}) AS u
      FROM orders GROUP BY 1
    ), keyed AS (
      SELECT day, u,
             date_diff('day', DATE '{_SEASON_ANCHOR}', day) AS dk
      FROM daily
    ), tr AS (
      SELECT day, dk, u,
             CAST(floor(CAST(sum(u) OVER w AS DOUBLE) / count(*) OVER w)
                  AS BIGINT) AS t
      FROM keyed
      WINDOW w AS (ORDER BY dk RANGE BETWEEN {TREND_HALF_WINDOW} PRECEDING
                   AND {TREND_HALF_WINDOW} FOLLOWING)
    ), dt AS (
      SELECT day, u, t, u - t AS detr,
             CAST(dk % 7 AS INTEGER) AS dow
      FROM tr
    ), sea AS (
      SELECT dow,
             CAST(floor(CAST(sum(detr) AS DOUBLE) / count(*)) AS BIGINT) AS s
      FROM dt GROUP BY dow
    ), res AS (
      SELECT dt.day, dt.dow, dt.u, dt.t, sea.s, dt.detr - sea.s AS r
      FROM dt JOIN sea USING (dow)
    ), thr AS (
      SELECT CAST(floor(CAST(sum(abs(r)) AS DOUBLE) / count(*)) AS BIGINT)
                 AS mean_abs_r
      FROM res
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, dow,
           CAST(u AS DOUBLE) / 100 AS revenue,
           CAST(t AS DOUBLE) / 100 AS trend,
           CAST(s AS DOUBLE) / 100 AS seasonal,
           CAST(r AS DOUBLE) / 100 AS residual,
           CAST(abs(r) > {ANOM_K} * mean_abs_r AS INTEGER) AS is_anomaly
    FROM res, thr
    """,
)
def q_seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose_revenue(load_table(spark, sf_dir, "orders"))
