"""User-lifecycle analytics: SCD2 history, funnels, cohort retention.

Superset surface (the reference has no users, time, or state — its
workload is whole-corpus MapReduce, ``test.sh:70-107``). These are
the warehouse-side primitives an event platform needs:

- SCD2 (slowly-changing-dimension type 2): collapse each user's
  event stream into validity intervals — one row per run of equal
  status with ``valid_from``/``valid_to``/``is_current``. This is
  the batch construction that ``MERGE``-based dimension maintenance
  incrementalizes.
- Ordered funnel: users who did signup → view → purchase in that
  temporal order, counted per stage.
- Cohort retention: users bucketed by first-seen week, distinct
  actives per (cohort, week-offset).

Scale shape: everything partitions by ``user_id`` (high cardinality,
no global windows). SCD2 is lag/lead windows over user partitions;
the funnel is three min-aggregations on the same user key — Catalyst
reuses one hash partitioning for all three, so it costs ONE shuffle
of the filtered event slice, not three; retention joins each event
to its user's first-seen row on the already-partitioned key.
Determinism: (ts, event_id) is a unique order within a user, so
lag/lead and stage minima are reproducible under ts ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_O_TS_FMT = "%Y-%m-%d %H:%M:%S"

FUNNEL_STAGES = ("signup", "view", "purchase")


def scd2_user_status(events: DataFrame) -> DataFrame:
    """Type-2 dimension of each user's event_type runs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.date_format("ts", _TS_FMT).alias("valid_from"),
        F.date_format(F.lead("ts").over(w2), _TS_FMT).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


_SCD2_ORACLE = f"""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT *, lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type AS status,
           strftime(ts, '{_O_TS_FMT}') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '{_O_TS_FMT}') AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM changes
    """


@query("scd2_user_status", oracle=_SCD2_ORACLE)
def q_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_user_status(load_table(spark, sf_dir, "events"))


def funnel_counts(events: DataFrame) -> DataFrame:
    """Users completing signup → view → purchase, in temporal order:
    t1 = first signup, t2 = first view after t1, t3 = first purchase
    after t2.

    Single-scan form: ONE shuffle collects each user's stage events as
    a time-sorted array, and a JVM-side ``aggregate`` fold runs the
    three-state funnel machine left to right — exactly the sequential
    semantics the stage definitions describe. The previous chained
    join formulation (t1 feeding t2 feeding t3, plus a count per
    stage) read the events scan SIX times because every stage subtree
    was duplicated into its downstream consumers
    (scripts/audit_scans.py, round 4); the fold reads it once.
    Per-user state is bounded by that user's funnel-stage activity —
    the same collect discipline as the session-path operators.
    """
    ev = events.where(F.col("event_type").isin(*FUNNEL_STAGES)).select(
        "user_id", "event_type", "ts"
    )
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, e):
        hit1 = (e["event_type"] == "signup") & acc["t1"].isNull()
        hit2 = (
            (e["event_type"] == "view")
            & acc["t1"].isNotNull()
            & acc["t2"].isNull()
            & (e["ts"] > acc["t1"])
        )
        hit3 = (
            (e["event_type"] == "purchase")
            & acc["t2"].isNotNull()
            & acc["t3"].isNull()
            & (e["ts"] > acc["t2"])
        )
        return F.struct(
            F.when(hit1, e["ts"]).otherwise(acc["t1"]).alias("t1"),
            F.when(hit2, e["ts"]).otherwise(acc["t2"]).alias("t2"),
            F.when(hit3, e["ts"]).otherwise(acc["t3"]).alias("t3"),
        )

    state = seq.select(F.aggregate("seq", init, step).alias("st"))
    counts = state.agg(
        F.count("st.t1").alias("n1"),
        F.count("st.t2").alias("n2"),
        F.count("st.t3").alias("n3"),
    )
    stages = F.array(
        F.struct(
            F.lit(1).alias("stage"),
            F.lit("signup").alias("event_type"),
            F.col("n1").alias("n"),
        ),
        F.struct(
            F.lit(2).alias("stage"),
            F.lit("view").alias("event_type"),
            F.col("n2").alias("n"),
        ),
        F.struct(
            F.lit(3).alias("stage"),
            F.lit("purchase").alias("event_type"),
            F.col("n3").alias("n"),
        ),
    )
    return counts.select(F.explode(stages).alias("s")).select("s.*")


@query(
    "funnel_signup_view_purchase",
    oracle="""
    WITH t1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'signup' AS event_type, count(*) AS n FROM t1
    UNION ALL
    SELECT 2 AS stage, 'view' AS event_type, count(*) AS n FROM t2
    UNION ALL
    SELECT 3 AS stage, 'purchase' AS event_type, count(*) AS n FROM t3
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_counts(load_table(spark, sf_dir, "events"))


def weekly_retention(events: DataFrame) -> DataFrame:
    """Distinct active users per (first-seen-week cohort, week offset)."""
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = events.join(first_seen, "user_id").select(
        "user_id",
        F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd").alias(
            "cohort_week"
        ),
        F.floor(
            F.datediff(F.date_trunc("week", "ts"), F.date_trunc("week", "first_ts"))
            / F.lit(7)
        ).alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("active_users")
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', date_trunc('week', f.first_ts),
                          date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weekly_retention(load_table(spark, sf_dir, "events"))


# --- point-in-time join against the SCD2 dimension ------------------------


def pit_join_purchase_context(events: DataFrame) -> DataFrame:
    """Point-in-time join: each purchase matched to the SCD2 status
    interval VALID AT its timestamp — the correct way to consume a
    type-2 dimension (a plain join to ``is_current`` silently
    backdates today's state onto historical facts).

    The dimension is the user's NON-purchase activity runs (view/
    click/error), so the result answers "what was the user doing when
    they bought?" — purchases before any activity fall out of every
    interval and report as 'none'. Intervals [valid_from, valid_to)
    partition each user's timeline (same-timestamp runs collapse to
    empty intervals that match nothing), so every purchase matches AT
    MOST one version row — the join is provably 1:≤1, which is what
    distinguishes a PIT join from a sloppy range join.

    Scale shape: equi-join on user_id with the interval predicate as
    a post-join filter (per-user version counts are bounded by
    activity runs); aggregation is map-side combinable. Revenue rides
    exact integer cents.
    """
    from mapreduce_lab_spark.functions.numeric import exact_sum

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    activity = events.where(F.col("event_type") != "purchase")
    changes = (
        activity.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("status"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("vt"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = purchases.join(
        dim,
        (purchases.user_id == dim.d_user)
        & (dim.vf <= purchases.ts)
        & (dim.vt.isNull() | (purchases.ts < dim.vt)),
        "left",
    )
    return (
        joined.select(
            F.coalesce("status", F.lit("none")).alias("status_at_purchase"),
            "value",
        )
        .groupBy("status_at_purchase")
        .agg(
            F.count("*").alias("n_purchases"),
            exact_sum("value", 100).alias("revenue"),
        )
    )


_PIT_SQL = """
WITH changes AS (
    SELECT user_id, event_type, ts, event_id
    FROM (
        SELECT *, lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events WHERE event_type <> 'purchase'
    )
    WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
    SELECT user_id, event_type AS status, ts AS vf,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
    FROM changes
),
p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT coalesce(d.status, 'none') AS status_at_purchase,
       count(*) AS n_purchases,
       (CAST(sum(CAST(round(p.value * 100) AS BIGINT)) AS DOUBLE) / 100)
           AS revenue
FROM p LEFT JOIN dim d
  ON d.user_id = p.user_id AND d.vf <= p.ts AND (d.vt IS NULL OR p.ts < d.vt)
GROUP BY coalesce(d.status, 'none')
"""


@query("pit_join_purchase_context", oracle=_PIT_SQL)
def q_pit_join_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to the activity state valid at purchase
    time (PIT join against the SCD2 dimension)."""
    return pit_join_purchase_context(load_table(spark, sf_dir, "events"))


# --- incremental SCD2 maintenance -----------------------------------------

# Last-4-hours delta: at every test SF a real MAJORITY of users is
# UNAFFECTED (e.g. 49/150 affected at sf0.01), so the keep-branch
# anti-join and the rebuild branch are both exercised non-trivially
# (pinned in tests/test_scd2_incremental.py).
SCD2_SPLIT_TS = "2024-01-30 20:00:00"


def scd2_incremental(events: DataFrame, split_ts: str = SCD2_SPLIT_TS) -> DataFrame:
    """Incremental type-2 dimension maintenance — the DIMENSION member
    of the IVM trilogy (aggregate: ``incremental_daily_revenue``;
    join view: ``ivm_join_revenue``; this: SCD2 refresh).

    A new batch of events can extend a user's open interval, close it,
    or append versions — touching arbitrary existing rows of that
    user, so row-level delta algebra doesn't apply. The production
    pattern is TARGETED RECOMPUTE: rebuild the dimension only for
    users present in the delta (bounded by daily active users),
    keep every other user's rows untouched, union. The result is
    provably identical to a from-scratch build — which is exactly the
    oracle: the SAME full-recompute SQL as ``scd2_user_status``.

    Scale shape: the affected-user set broadcasts; unaffected rows
    ride a broadcast anti-join (no dimension shuffle); the rebuild
    reads only affected users' history (in a real lake, pruned by the
    user-bucketed layout that ``write_bucketed_table`` provides).
    """
    affected = (
        events.where(F.col("ts") >= F.lit(split_ts))
        .select("user_id")
        .distinct()
    )
    keep = scd2_user_status(
        events.where(F.col("ts") < F.lit(split_ts))
    ).join(F.broadcast(affected), "user_id", "left_anti")
    rebuilt = scd2_user_status(
        events.join(F.broadcast(affected), "user_id", "left_semi")
    )
    return keep.unionByName(rebuilt)


@query("scd2_incremental_refresh", oracle=_SCD2_ORACLE)
def q_scd2_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension refreshed incrementally from the post-split delta;
    oracle = the monolithic full rebuild."""
    return scd2_incremental(load_table(spark, sf_dir, "events"))


# --- conversion lag percentiles ---------------------------------------------


def conversion_lag_percentiles(events: DataFrame) -> DataFrame:
    """Signup-to-first-purchase latency distribution — the
    time-to-convert half of the funnel family (the funnel above
    counts WHO converts; this measures HOW FAST): per user, the lag
    from the FIRST signup to the FIRST purchase at or after it, then
    exact type-7 percentiles over the per-user lag seconds.

    Truncated-epoch seconds (ts.cast(long) == floor(epoch(ts))) keep
    the lag integer and cross-engine exact; min-after-filter gives
    the first conversion without any per-user ordering. Scale shape:
    two map-side-combinable per-user aggregates joined on user_id —
    Catalyst aligns the partitioning — and the percentile runs over
    one row per CONVERTED user.
    """
    s = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    lag = (
        s.join(p, "user_id")
        .where(F.col("p_ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.col("p_ts").cast("long") - F.col("s_ts").cast("long")
            ).alias("lag_s")
        )
    )
    return lag.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("lag_s", F.lit(0.5)).alias("lag_p50"),
        F.percentile("lag_s", F.lit(0.9)).alias("lag_p90"),
        F.percentile("lag_s", F.lit(0.99)).alias("lag_p99"),
        F.max("lag_s").alias("lag_max"),
    )


@query(
    "conversion_lag_percentiles",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    lag AS (
      SELECT s.user_id,
             min(CAST(floor(epoch(e.ts)) AS BIGINT)
                 - CAST(floor(epoch(s.s_ts)) AS BIGINT)) AS lag_s
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.s_ts
      GROUP BY 1
    )
    SELECT count(*) AS n_converted,
           quantile_cont(lag_s, 0.5) AS lag_p50,
           quantile_cont(lag_s, 0.9) AS lag_p90,
           quantile_cont(lag_s, 0.99) AS lag_p99,
           max(lag_s) AS lag_max
    FROM lag
    """,
)
def q_conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_lag_percentiles(load_table(spark, sf_dir, "events"))


# --- survival life table (censoring-aware conversion analysis) ---------------

# The Kaplan-Meier life table (Kaplan & Meier 1958, public) for
# signup -> first purchase: conversion_lag_percentiles above measures
# HOW FAST converters convert, but silently drops everyone who has
# not converted YET — the survival view counts them as CENSORED at
# the observation end, which is the only unbiased way to report
# conversion speed on a live corpus. Output: one row per whole-day
# duration t with the number at risk entering t, conversions at t,
# censorings at t, and the exact-ratio discrete hazard d/n — the life
# table the KM curve is a running product of.
#
# Scale shape: two per-user combinable aggregates joined on user_id,
# one duration histogram groupBy, and a reverse cumulative window
# over the observation-window-bounded frame (~31 rows here; always
# calendar-bounded). The observation end is ONE driver scalar (max
# event day — the pagerank-N discipline). All-integer day arithmetic.


def life_table_signup_purchase(events: DataFrame) -> DataFrame:
    """(t_days, n_risk, d_converted, n_censored, hazard) per duration
    day — hazard is the floor-scaled exact ratio d / n_risk."""
    obs_end = events.agg(F.max(F.to_date("ts")).alias("d")).collect()[0]["d"]
    if obs_end is None:
        return events.select(
            F.lit(0).cast("long").alias("t_days"),
            F.lit(0).cast("long").alias("n_risk"),
            F.lit(0).cast("long").alias("d_converted"),
            F.lit(0).cast("long").alias("n_censored"),
            F.lit(0.0).alias("hazard"),
        ).limit(0)
    s = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(p, "user_id")
        .where(F.col("p_ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("c_ts"))
    )
    per_user = s.join(conv, "user_id", "left").select(
        F.when(
            F.col("c_ts").isNotNull(),
            F.datediff(F.to_date("c_ts"), F.to_date("s_ts")),
        )
        .otherwise(F.datediff(F.lit(obs_end), F.to_date("s_ts")))
        .cast("long")
        .alias("t_days"),
        F.col("c_ts").isNotNull().cast("long").alias("event"),
    )
    hist = per_user.groupBy("t_days").agg(
        F.sum("event").alias("d_converted"),
        F.sum(F.lit(1) - F.col("event")).alias("n_censored"),
    )
    w = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    from mapreduce_lab_spark.functions.numeric import exact_ratio

    return hist.select(
        "t_days",
        F.sum(F.col("d_converted") + F.col("n_censored")).over(w).alias("n_risk"),
        "d_converted",
        "n_censored",
    ).select(
        "t_days",
        "n_risk",
        "d_converted",
        "n_censored",
        exact_ratio(F.col("d_converted"), F.col("n_risk")).alias("hazard"),
    )


_LIFE_TABLE_ORACLE = """
WITH obs AS (SELECT CAST(max(ts) AS DATE) AS obs_end FROM events),
s AS (
  SELECT user_id, min(ts) AS s_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
  SELECT s.user_id, min(e.ts) AS c_ts
  FROM s JOIN events e
    ON e.user_id = s.user_id
   AND e.event_type = 'purchase'
   AND e.ts >= s.s_ts
  GROUP BY 1
),
per_user AS (
  SELECT CAST(CASE WHEN conv.c_ts IS NOT NULL
              THEN date_diff('day', CAST(s.s_ts AS DATE),
                             CAST(conv.c_ts AS DATE))
              ELSE date_diff('day', CAST(s.s_ts AS DATE),
                             (SELECT obs_end FROM obs)) END AS BIGINT)
             AS t_days,
         CASE WHEN conv.c_ts IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM s LEFT JOIN conv ON conv.user_id = s.user_id
),
hist AS (
  SELECT t_days,
         CAST(sum(event) AS BIGINT) AS d_converted,
         CAST(sum(1 - event) AS BIGINT) AS n_censored
  FROM per_user GROUP BY 1
)
SELECT t_days,
       CAST(sum(d_converted + n_censored)
            OVER (ORDER BY t_days DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_risk,
       d_converted, n_censored,
       (floor(CAST(d_converted AS DOUBLE) * 1000000
              / (sum(d_converted + n_censored)
                 OVER (ORDER BY t_days DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
        / 1000000.0) AS hazard
FROM hist
"""


@query("life_table_signup_purchase", oracle=_LIFE_TABLE_ORACLE)
def q_life_table_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return life_table_signup_purchase(load_table(spark, sf_dir, "events"))
